"""Multimodal column plumbing (SURVEY §7.7).

Image/audio/video content is carried as an opaque ``binary`` column plus a
typed metadata struct; decode / feature-extraction runs as an Arrow-batched
pandas stage (``mapInPandas``) — the one place Python belongs, because the
work is per-byte, not relational. The Spark-side contract (schema,
partitioning, batch shape) is real and tested; the actual codec call is
STUBBED (no image/audio libraries in this container):

- :func:`decode_image` raises ``NotImplementedError`` — the marked seam
  where Pillow/torchvision/ffmpeg plugs in.
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

from pyspark.sql import Column, DataFrame
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


def decode_image(payload: bytes) -> object:
    """The real-codec seam. Container has no imaging libraries — decoding is
    intentionally unimplemented; callers use :func:`extract_features`'s
    deterministic fake path for plumbing tests."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; plug Pillow/torchvision in here"
    )


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
