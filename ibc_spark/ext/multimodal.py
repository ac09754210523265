"""Multimodal column plumbing (SURVEY §7.7).

Image/audio/video content is carried as an opaque ``binary`` column plus a
typed metadata struct; decode / feature-extraction runs as an Arrow-batched
pandas stage (``mapInPandas``) — the one place Python belongs, because the
work is per-byte, not relational. The Spark-side contract (schema,
partitioning, batch shape) is real and tested, and since round 6 so is the
codec for uncompressed formats:

- :func:`decode_image` REALLY decodes PPM (P6) and uncompressed 24-bit
  BMP in pure numpy (plus :func:`encode_ppm` / :func:`resize_nearest` /
  :func:`image_channel_stats`; the encode→decode identity is
  oracle-checked by ``multimodal_image_roundtrip_stats``). Only
  entropy-coded formats (JPEG/PNG/...) remain a loud
  ``NotImplementedError`` seam where Pillow/torchvision/ffmpeg plugs in.
- :func:`extract_features` computes DETERMINISTIC fake features from the
  raw bytes, so the full pipeline (including the pandas boundary) is
  hash-checkable against a SQL oracle.

At 100 TB: ``spark.read.format("binaryFile")`` (or parquet with a binary
column) partitions by file/row-group; the pandas stage is a narrow map —
no shuffle; ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
memory for large payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("head_byte", T.LongType()),
        T.StructField("fake_embedding", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Attach an opaque payload + typed metadata to each row (stand-in for a
    real media column; payload = UTF-8 bytes of the text head so every
    engine can reproduce it)."""
    payload = F.encode(F.substring(F.col(text_col), 1, 64), "UTF-8")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.lit("fake").alias("codec"),
        ).alias("media_meta"),
    )


def encode_ppm(arr) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary PPM (P6) — the test-side
    twin of :func:`decode_image`'s PPM path."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("expected (H, W, 3) uint8 array")
    h, w = a.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def _decode_ppm(payload: bytes):
    """P6 header = ASCII tokens (magic, width, height, maxval) separated by
    whitespace, '#' comments allowed, one whitespace byte before the raw
    RGB plane."""
    import numpy as np

    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    pos += 1  # single whitespace after maxval
    plane = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return plane.reshape(h, w, 3).copy()


def _decode_bmp(payload: bytes):
    """Uncompressed 24-bit BMP: little-endian header fields, rows padded to
    4 bytes, stored bottom-up (top-down when height is negative), BGR
    order."""
    import struct

    import numpy as np

    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return (img[::-1] if flip else img).copy()


def decode_image(payload: bytes):
    """Decode a media payload into an (H, W, 3) uint8 numpy array.

    REAL pure-numpy decoders for the uncompressed container formats (PPM
    P6 and 24-bit BMP) — no imaging library needed; the
    ``NotImplementedError`` seam now covers only COMPRESSED codecs
    (JPEG/PNG/WebP/...), where Pillow/torchvision would plug in. This is
    the honest split: byte-layout parsing is pure numpy; entropy-coded
    decompression is not worth reimplementing."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "compressed image codecs (JPEG/PNG/...) require an imaging library "
        "not present in this environment; PPM(P6) and 24-bit BMP decode "
        "natively"
    )


def resize_nearest(arr, *, width: int, height: int):
    """Nearest-neighbor resample of an (H, W, C) array via integer index
    maps — the numpy form of the classic box-free resize (deterministic,
    no interpolation kernel)."""
    import numpy as np

    a = np.asarray(arr)
    h, w = a.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return a[rows][:, cols].copy()


def image_channel_stats(df: DataFrame, *, payload_col: str = "payload") -> DataFrame:
    """REAL decode pipeline over the binary column: parse each payload with
    :func:`decode_image` and emit (doc_id, width, height, per-channel mean)
    — Arrow-batched ``mapInPandas``, the exact production shape with the
    stub removed for uncompressed formats. Undecodable payloads yield a
    NULL row (errors-as-data, engine convention)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
        ]
    )

    def _stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    img = decode_image(bytes(payload))
                    m = img.reshape(-1, 3).mean(axis=0)
                    out.append(
                        (doc_id, img.shape[1], img.shape[0], float(m[0]), float(m[1]), float(m[2]))
                    )
                except Exception:  # undecodable → NULL row, never a failed task
                    out.append((doc_id, None, None, None, None, None))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "mean_r", "mean_g", "mean_b"]
            )

    return df.mapInPandas(_stats, schema)


def extract_features(df: DataFrame, *, dim: int = 8) -> DataFrame:
    """Arrow-batched pandas feature extraction over the binary column.

    Features are deterministic functions of the payload bytes (length, first
    byte, and a tiny linear-congruential fake embedding), so the output is
    oracle-checkable while exercising the exact mapInPandas shape a real
    decoder uses (batch iterator in, batch iterator out, columnar transfer).
    """

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            byte_len = payloads.map(len)
            head = payloads.map(lambda b: int(b[0]) if len(b) else -1)
            fake = [
                [float((ln * (i + 1)) % 97) for i in range(dim)] for ln in byte_len
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": byte_len.astype("int64"),
                    "head_byte": head.astype("int64"),
                    "fake_embedding": fake,
                }
            )

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, *, width: int = 4, height: int = 4
) -> DataFrame:
    """Resize stage over the binary column (Arrow-batched ``mapInPandas``).

    The interpolation kernel is STUBBED with a deterministic byte
    down-sample (stride slicing of the payload into width·height bytes,
    zero-padded) — the seam where a real decoder+resampler (Pillow/
    torchvision) plugs in. Schema, batch iteration, and binary-out plumbing
    are the real contract a production resize uses.
    """

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        n = width * height
        out_px = []

        def px(b: bytes) -> bytes:
            if not b:
                return bytes(n)
            stride = max(len(b) // n, 1)
            sampled = b[::stride][:n]
            return sampled + bytes(n - len(sampled))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "pixels": pdf["payload"].map(px),
                }
            )

    return df.mapInPandas(_resize, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, *, n_frames: int = 3, frame_size: int = 8
) -> DataFrame:
    """Frame-sampling stage (video analogue): emit ``n_frames`` evenly-
    spaced byte windows per payload — a 1:N ``mapInPandas`` fan-out (one
    media row in, one row per sampled frame out), which is exactly the
    shape a real keyframe extractor produces. Codec seam stubbed; the
    offsets are deterministic so the output is oracle-checkable."""

    def _frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, idxs, offs, chunks = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = payload or b""
                span = max(len(b) - frame_size, 0)
                for i in range(n_frames):
                    off = (span * i) // max(n_frames - 1, 1)
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(off)
                    chunks.append(bytes(b[off : off + frame_size]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                    "frame_bytes": chunks,
                }
            )

    return df.mapInPandas(_frames, FRAME_SCHEMA)
