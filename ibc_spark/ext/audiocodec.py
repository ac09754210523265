"""Lossless entropy-coded audio: a REAL Rice/fixed-predictor codec (the
core coding layer of the Shorten → FLAC lineage: fixed polynomial
prediction + Golomb–Rice residual coding), implemented split-stream so
both encode AND decode are fully numpy-vectorized — no per-sample Python.

What "real" means here: actual bit-packing to bytes, an exact
decode(encode(x)) == x identity for every int16 waveform, and a
compressed size that a SQL engine can re-derive from first principles
(the Rice bit-length formula is closed-form over the residuals), so the
DuckDB oracle independently prices every payload's bitstream and a hash
match proves the codec produced exactly those bytes. What it does NOT
claim: bitstream compatibility with the FLAC container format — this
sandbox has no reference decoder to conformance-test against, so
FLAC/MP3 file decoding remains the documented audio-library seam
(``ext/multimodal.py::decode_audio``); this module closes the
entropy-CODING half of that seam with a verifiable codec of our own.

Frame layout (version 1, order-2 fixed predictor):
  'R''C'  version(1)  order(1)  k(1)  n(4 LE)  ulen(4 LE)
  warmup: min(order, n) samples verbatim (int16 LE)
  unary substream (ulen bytes): for each residual, q zero bits then a 1
  remainder substream: k-bit fields, MSB-first, byte-padded
Residual r_i = Δ²s (second difference), zigzag-mapped u = 2r / -2r-1;
k = bit_length(sum(u) // count(u)) - 1 (0 when the mean is 0) — the
classic Rice parameter from the mean, integer-exact on every engine.
The split-stream layout (all unary runs contiguous, all remainders
contiguous) costs the same bits as interleaved Rice but lets decode find
every terminator with one ``flatnonzero`` and every remainder with one
reshape; order-2 reconstruction is two cumulative sums. At 100 TB the
codec is a stateless narrow map over the payload column — the same
Arrow-batched shape as every multimodal kernel, no shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ibc_spark.ext.multimodal import decode_audio

_MAGIC = b"RC"
_VERSION = 1
_ORDER = 2

__all__ = ["encode_rice", "decode_rice", "rice_k_for", "audio_rice_stats"]


def rice_k_for(u) -> int:
    """Rice parameter from the zigzag residual mean, integer-exact:
    k = bit_length(sum // count) - 1, floored at 0 (and 0 for empty) —
    the same arithmetic the SQL oracle replays with a shift-join."""
    n = len(u)
    if n == 0:
        return 0
    m = int(u.sum()) // n
    return max(m.bit_length() - 1, 0)


def _residuals(s):
    """(warmup, u): order-2 warmup samples and zigzag second differences."""
    import numpy as np

    a = np.asarray(s, dtype=np.int64)
    w = a[: min(_ORDER, len(a))]
    if len(a) <= _ORDER:
        return w, np.zeros(0, dtype=np.int64)
    r = np.diff(np.diff(a))
    u = np.where(r >= 0, 2 * r, -2 * r - 1)
    return w, u


def encode_rice(samples) -> bytes:
    """Encode an int16 sample array losslessly; returns the frame bytes."""
    import numpy as np

    w, u = _residuals(samples)
    n = len(np.asarray(samples))
    k = rice_k_for(u)
    q = u >> k
    nr = len(u)
    ubits = int(q.sum()) + nr
    unary = np.zeros(ubits, dtype=np.uint8)
    if nr:
        unary[np.cumsum(q + 1) - 1] = 1
    upacked = np.packbits(unary) if ubits else np.zeros(0, dtype=np.uint8)
    if k and nr:
        shifts = np.arange(k - 1, -1, -1, dtype=np.int64)
        rem = ((u[:, None] >> shifts) & 1).astype(np.uint8)
        rpacked = np.packbits(rem.ravel())
    else:
        rpacked = np.zeros(0, dtype=np.uint8)
    header = _MAGIC + struct.pack("<BBBI", _VERSION, _ORDER, k, n)
    header += struct.pack("<I", len(upacked))
    return (
        header
        + np.asarray(w, dtype="<i2").tobytes()
        + upacked.tobytes()
        + rpacked.tobytes()
    )


def decode_rice(payload: bytes):
    """Decode a frame back to the exact int16 sample array."""
    import numpy as np

    if payload[:2] != _MAGIC:
        raise ValueError("not a Rice frame")
    version, order, k, n = struct.unpack_from("<BBBI", payload, 2)
    if version != _VERSION or order != _ORDER:
        raise ValueError("unsupported Rice frame version/order")
    (ulen,) = struct.unpack_from("<I", payload, 9)
    pos = 13
    nw = min(order, n)
    w = np.frombuffer(payload, dtype="<i2", count=nw, offset=pos).astype(np.int64)
    pos += 2 * nw
    nr = n - nw if n > order else 0
    if nr == 0:
        return w.astype(np.int16)
    ubytes = np.frombuffer(payload, dtype=np.uint8, count=ulen, offset=pos)
    pos += ulen
    ones = np.flatnonzero(np.unpackbits(ubytes))
    if len(ones) < nr:
        raise ValueError("truncated unary substream")
    term = ones[:nr]
    q = np.diff(term, prepend=-1) - 1
    if k:
        rbytes = np.frombuffer(
            payload, dtype=np.uint8, count=(nr * k + 7) // 8, offset=pos
        )
        rbits = np.unpackbits(rbytes)[: nr * k].reshape(nr, k).astype(np.int64)
        shifts = np.arange(k - 1, -1, -1, dtype=np.int64)
        rem = (rbits << shifts).sum(axis=1)
    else:
        rem = np.zeros(nr, dtype=np.int64)
    u = (q << k) | rem
    r = np.where(u % 2 == 0, u // 2, -(u + 1) // 2)
    # order-2 reconstruction = two cumulative sums from the warmup pair
    d1 = (w[1] - w[0]) + np.cumsum(r)
    s = w[1] + np.cumsum(d1)
    return np.concatenate([w, s]).astype(np.int16)


RICE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("raw_bytes", LongType()),
        StructField("rice_bytes", LongType()),
        StructField("k", IntegerType()),
        StructField("ratio_permille", LongType()),
        StructField("roundtrip_ok", BooleanType()),
    ]
)


def audio_rice_stats(df: DataFrame, *, payload_col: str = "payload") -> DataFrame:
    """Entropy-encode every audio payload (REAL WAV decode → Rice frame),
    verify the lossless round trip sample-for-sample, and emit the
    compression accounting: raw PCM bytes, actual frame bytes, the chosen
    Rice parameter, and an integer permille ratio. The DuckDB oracle
    re-derives ``rice_bytes`` from the closed-form bit-length of the same
    residual stream — a hash match proves the encoder packed exactly the
    predicted bits and nothing else. Arrow-batched ``mapInPandas``,
    narrow map, no shuffle; undecodable payloads yield a NULL row
    (errors-as-data)."""

    def _rice(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        cols = [f.name for f in RICE_STATS_SCHEMA.fields]
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                try:
                    _rate, _ch, s = decode_audio(bytes(payload))
                    blob = encode_rice(s)
                    ok = bool(np.array_equal(decode_rice(blob), s))
                    _w, u = _residuals(s)
                    raw = 2 * len(s)
                    out.append(
                        (
                            doc_id,
                            len(s),
                            raw,
                            len(blob),
                            rice_k_for(u),
                            len(blob) * 1000 // raw if raw else None,
                            ok,
                        )
                    )
                except Exception:  # undecodable → NULL row, never a failed task
                    out.append((doc_id, None, None, None, None, None, None))
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(_rice, RICE_STATS_SCHEMA)
