"""Rice/fixed-predictor lossless audio codec (round 11): round-trip
identity over random waveforms, the closed-form byte-length contract the
DuckDB oracle replays, corrupt-frame rejection, and the Spark face's
errors-as-data totality."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ibc_spark.ext import multimodal
from ibc_spark.ext.audiocodec import (
    _residuals,
    audio_rice_stats,
    decode_rice,
    encode_rice,
    rice_k_for,
)

int16s = st.integers(min_value=-32768, max_value=32767)


@settings(max_examples=200, deadline=None)
@given(st.lists(int16s, min_size=0, max_size=400))
def test_rice_roundtrip_identity(samples):
    s = np.asarray(samples, dtype=np.int16)
    assert np.array_equal(decode_rice(encode_rice(s)), s)


@settings(max_examples=100, deadline=None)
@given(st.lists(int16s, min_size=0, max_size=400))
def test_rice_byte_length_matches_closed_form(samples):
    """The oracle contract: actual frame bytes == header + warmup +
    ceil((sum q + nr)/8) + ceil(nr·k/8), with k from the integer residual
    mean. If this drifts, the SQL oracle (which re-derives the same
    number) catches it corpus-wide — this pins it per-waveform."""
    s = np.asarray(samples, dtype=np.int16)
    _w, u = _residuals(s)
    k = rice_k_for(u)
    nr = len(u)
    sq = int((u >> k).sum())
    nw = min(2, len(s))
    expect = (
        13
        + 2 * nw
        + ((sq + nr + 7) // 8 if nr else 0)
        + ((nr * k + 7) // 8 if k and nr else 0)
    )
    assert len(encode_rice(s)) == expect


def test_rice_compresses_structured_and_survives_noise():
    tone = (np.sin(np.arange(16384) / 16) * 12000).astype(np.int16)
    const = np.full(5000, 1234, np.int16)
    noise = np.random.default_rng(5).integers(-32768, 32768, 10000).astype(np.int16)
    assert len(encode_rice(tone)) < 0.5 * 2 * len(tone)
    assert len(encode_rice(const)) < 0.1 * 2 * len(const)
    # Rice without escape codes EXPANDS white noise (documented); the
    # round trip must still be exact
    assert np.array_equal(decode_rice(encode_rice(noise)), noise)


def test_rice_worst_case_residuals_roundtrip():
    s = np.array([-32768, 32767] * 100, np.int16)
    blob = encode_rice(s)
    assert np.array_equal(decode_rice(blob), s)


def test_decode_rejects_corrupt_frames():
    with pytest.raises(ValueError):
        decode_rice(b"XX" + b"\x00" * 16)
    good = encode_rice(np.arange(40, dtype=np.int16) * 100)
    with pytest.raises(ValueError):
        decode_rice(good[:1] + b"Z" + good[2:])  # bad magic
    # truncated unary substream: declared n bigger than the bits present
    import struct

    n = struct.unpack_from("<I", good, 5)[0]
    bad = good[:5] + struct.pack("<I", n + 50) + good[9:]
    with pytest.raises(ValueError):
        decode_rice(bad)


def test_spark_face_stats_and_null_rows(spark):
    docs = spark.createDataFrame(
        [(1, "hello world this is a doc"), (2, "x")], ["doc_id", "text"]
    )
    rows = {
        r.doc_id: r
        for r in audio_rice_stats(multimodal.attach_audio(docs)).collect()
    }
    assert rows[1].roundtrip_ok and rows[2].roundtrip_ok
    assert rows[1].raw_bytes == 2 * rows[1].n_samples
    assert rows[1].ratio_permille == rows[1].rice_bytes * 1000 // rows[1].raw_bytes
    # undecodable payload → NULL row, never a failed task
    bad = spark.createDataFrame([(9, bytearray(b"not audio"))], ["doc_id", "payload"])
    r = audio_rice_stats(bad).collect()[0]
    assert r.doc_id == 9 and r.n_samples is None and r.roundtrip_ok is None


def test_empty_corpus_totality(spark, empty_sf):
    from ibc_spark.registry import QUERIES

    assert QUERIES["multimodal_audio_rice_codec"](spark, empty_sf).count() == 0
