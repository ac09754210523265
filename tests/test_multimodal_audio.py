"""Audio modality contracts (round 10): the RIFF/WAVE PCM codec must be
an exact identity over arbitrary int16 waveforms (rates, channel counts,
odd-length chunk alignment), the decimation path must equal index
selection, malformed/entropy-coded payloads must hit the documented
seam, and the Spark-side plumbing must emit NULL rows (errors-as-data)
rather than failing tasks."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ibc_spark.ext.multimodal import (
    FIR_HALF_WIDTH,
    FIR_SCALE,
    attach_audio,
    audio_features,
    decode_audio,
    encode_wav,
    encode_wav_float,
    fir_decimation_taps,
    fir_lowpass_int,
    resample_audio,
    transcode_audio_float,
)


@given(
    samples=st.lists(st.integers(min_value=-32768, max_value=32767), max_size=256),
    rate=st.sampled_from([4000, 8000, 16000, 44100]),
)
@settings(max_examples=100, deadline=None)
def test_wav_roundtrip_identity_mono(samples, rate):
    s = np.asarray(samples, dtype=np.int16)
    got_rate, ch, out = decode_audio(encode_wav(s, sample_rate=rate))
    assert got_rate == rate and ch == 1
    assert np.array_equal(out, s)


@given(
    frames=st.lists(
        st.tuples(
            st.integers(min_value=-32768, max_value=32767),
            st.integers(min_value=-32768, max_value=32767),
        ),
        max_size=64,
    )
)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_identity_stereo(frames):
    s = np.asarray([v for f in frames for v in f], dtype=np.int16)
    rate, ch, out = decode_audio(encode_wav(s, sample_rate=8000, channels=2))
    assert rate == 8000 and ch == 2
    assert np.array_equal(out, s)


def test_wav_chunk_walk_skips_unknown_and_word_aligns():
    """A LIST chunk with an ODD payload length before fmt /data must be
    skipped via the RIFF word-alignment rule — real WAV files carry
    metadata chunks the decoder has to walk over."""
    import struct

    s = np.array([1, -2, 3], dtype=np.int16)
    wav = bytearray(encode_wav(s, sample_rate=8000))
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded to 4
    patched = wav[:12] + extra + wav[12:]
    patched[4:8] = struct.pack("<I", len(patched) - 8)
    rate, ch, out = decode_audio(bytes(patched))
    assert rate == 8000 and ch == 1 and np.array_equal(out, s)


def test_wav_empty_samples_roundtrip():
    rate, ch, out = decode_audio(encode_wav(np.array([], dtype=np.int16)))
    assert rate == 16000 and ch == 1 and len(out) == 0


def test_encode_wav_rejects_bad_shapes():
    with pytest.raises(ValueError):
        encode_wav(np.zeros((2, 2), dtype=np.int16))
    with pytest.raises(ValueError):
        encode_wav(np.array([1, 2, 3], dtype=np.int16), channels=2)


def test_decode_audio_seams():
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04" + bytes(64))  # MP3: entropy-coded seam
    with pytest.raises(ValueError):
        decode_audio(b"RIFF\x00\x00\x00\x00AVI " + bytes(16))  # not WAVE
    # ADPCM (format code 2) → the codec seam, not a parse error
    # (float PCM, format code 3, decodes for real since r11)
    import struct

    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 4000, 256, 4)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF" + struct.pack("<I", len(body)) + body)


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=200
    ),
    factor=st.integers(min_value=1, max_value=7),
)
@settings(max_examples=60, deadline=None)
def test_decimation_equals_index_selection(samples, factor):
    """encode → decode → [::factor] → encode → decode == samples[::factor]
    (the index-selection half of the resample loop; the FIR half is
    property-tested separately below)."""
    s = np.asarray(samples, dtype=np.int16)
    rate, _ch, dec = decode_audio(encode_wav(s, sample_rate=16000))
    rate2, _ch2, out = decode_audio(
        encode_wav(dec[::factor], sample_rate=max(rate // factor, 1))
    )
    assert rate2 == max(16000 // factor, 1)
    assert np.array_equal(out, s[::factor])


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=120
    ),
    factor=st.integers(min_value=2, max_value=6),
)
@settings(max_examples=60, deadline=None)
def test_fir_lowpass_matches_bruteforce_reference(samples, factor):
    """fir_lowpass_int == the literal per-index spec
    ``clip(floor(sum_n taps[n] * x[i+n] / SCALE))`` with zero padding —
    the exact arithmetic the multimodal_audio_resample SQL oracle replays
    as a bounded-lag self-join."""
    taps = fir_decimation_taps(factor)
    assert int(taps.sum()) == FIR_SCALE  # unity DC gain, by construction
    x = np.asarray(samples, dtype=np.int64)
    ref = []
    for i in range(len(x)):
        acc = 0
        for k, n in enumerate(range(-FIR_HALF_WIDTH, FIR_HALF_WIDTH + 1)):
            j = i + n
            if 0 <= j < len(x):
                acc += int(taps[k]) * int(x[j])
        ref.append(int(np.clip(acc // FIR_SCALE, -32768, 32767)))
    got = fir_lowpass_int(x, taps)
    assert np.array_equal(got.astype(np.int64), np.asarray(ref, dtype=np.int64))


def test_fir_dc_and_alias_attenuation():
    """DSP sanity on the factor-4 taps: a constant (DC) signal passes
    through exactly; a full-scale alias tone AT the old Nyquist (the
    worst folding frequency) is attenuated by >= 40 dB."""
    taps = fir_decimation_taps(4)
    dc = np.full(256, 12345, dtype=np.int64)
    out = fir_lowpass_int(dc, taps)
    assert np.array_equal(out[FIR_HALF_WIDTH:-FIR_HALF_WIDTH], dc[FIR_HALF_WIDTH:-FIR_HALF_WIDTH].astype(np.int16))
    nyq = (np.where(np.arange(256) % 2 == 0, 30000, -30000)).astype(np.int64)
    mid = fir_lowpass_int(nyq, taps).astype(np.int64)[FIR_HALF_WIDTH:-FIR_HALF_WIDTH]
    assert np.abs(mid).max() <= 30000 / 100  # >= 40 dB down


@given(
    samples=st.lists(st.integers(min_value=-32768, max_value=32767), max_size=200),
    channels=st.sampled_from([1, 2]),
)
@settings(max_examples=60, deadline=None)
def test_float_pcm_roundtrip_identity(samples, channels):
    """int16 → k/32768 float32 → format-3 encode → decode(quantize) is the
    identity on the full int16 range (the property
    multimodal_audio_float_pcm hash-checks corpus-wide)."""
    s = np.asarray(samples, dtype=np.int16)
    if len(s) % channels:
        s = s[: len(s) - len(s) % channels]
    f = (s.astype(np.float64) / 32768.0).astype("<f4")
    rate, ch, back = decode_audio(encode_wav_float(f, sample_rate=8000, channels=channels))
    assert rate == 8000 and ch == channels
    assert np.array_equal(back, s)


def test_float_pcm_quantizer_clips_out_of_range():
    """Float samples outside [-1, 1] clip to the int16 rails instead of
    wrapping (the decode contract for hot-mastered float files)."""
    f = np.array([1.5, -2.0, 0.5, 1.0, -1.0], dtype="<f4")
    _r, _c, got = decode_audio(encode_wav_float(f, sample_rate=8000))
    assert got.tolist() == [32767, -32768, 16384, 32767, -32768]


def test_odd_data_chunk_is_an_error_not_a_half_sample_drop():
    """ADVICE r10: a data chunk that is not a whole number of frames is a
    truncated file — same policy as the truncated-chunk error, never a
    silent drop of the trailing half-sample."""
    import struct

    for code, bits, block, data in [
        (1, 16, 2, b"\x01\x02\x03"),  # int16, odd byte
        (1, 16, 4, b"\x01\x02"),  # stereo int16, half a frame
        (3, 32, 4, b"\x01\x02\x03"),  # float32, ragged
    ]:
        ch = block // (bits // 8)
        fmt = struct.pack("<HHIIHH", code, ch, 8000, 8000 * block, block, bits)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data + (b"\x00" * (len(data) & 1))
        payload = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(ValueError, match="whole number of frames"):
            decode_audio(payload)


def test_resample_rejects_factor_above_rate(spark):
    """ADVICE r10: factor > rate would emit a fabricated 1 Hz payload —
    reject to a NULL row instead."""
    low = bytes(encode_wav(np.array([1, 2, 3], dtype=np.int16), sample_rate=3))
    df = spark.createDataFrame([(1, low)], "doc_id long, payload binary")
    assert resample_audio(df, factor=4, antialias=False).collect()[0].payload is None


def test_resample_antialias_spark_matches_kernel(spark):
    """The Spark resample stage (antialias default) == fir_lowpass_int →
    [::factor] → encode, computed directly in NumPy."""
    rng = np.random.default_rng(11)
    s = rng.integers(-32768, 32512, size=97).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytes(encode_wav(s, sample_rate=16000)))], "doc_id long, payload binary"
    )
    payload = bytes(resample_audio(df, factor=4).collect()[0].payload)
    rate, ch, got = decode_audio(payload)
    want = fir_lowpass_int(s.astype(np.int64), fir_decimation_taps(4))[::4]
    assert rate == 4000 and ch == 1 and np.array_equal(got, want)


def test_transcode_audio_float_preserves_features(spark):
    """transcode_audio_float → audio_features == audio_features on the
    original int16 payload (identity loop), and junk payloads propagate
    as NULL rows."""
    s = np.array([1000, -1000, 32512, -32768, 0, 7], dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytes(encode_wav(s, sample_rate=16000))), (2, b"JUNK")],
        "doc_id long, payload binary",
    )
    direct = {r.doc_id: r for r in audio_features(df).collect()}
    viafloat = {r.doc_id: r for r in audio_features(transcode_audio_float(df)).collect()}
    assert direct[1] == viafloat[1]
    assert viafloat[2].n_samples is None


def test_audio_features_null_row_on_undecodable(spark):
    """A corrupt payload yields a NULL feature row, never a failed task
    (engine errors-as-data convention)."""
    df = spark.createDataFrame(
        [(1, bytes(encode_wav(np.array([100, -100], dtype=np.int16)))), (2, b"JUNK")],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in audio_features(df).collect()}
    assert rows[1].n_samples == 2 and rows[1].zero_crossings == 1
    assert rows[2].n_samples is None and rows[2].peak_abs is None


def test_attach_audio_waveform_derivation(spark):
    """The synthetic waveform is the documented byte formula — decoded
    samples of the attached payload match a NumPy recomputation from the
    text head."""
    df = spark.createDataFrame([(7, "abcDEF 123!")], "doc_id long, text string")
    payload = bytes(attach_audio(df).collect()[0].payload)
    rate, ch, got = decode_audio(payload)
    b = np.frombuffer(b"abcDEF 123!", dtype=np.uint8).astype(np.int64)
    idx = np.arange(len(b))
    want = ((((b * 37 + idx * 11) % 256) - 128) * 256).astype(np.int16)
    assert rate == 16000 and ch == 1 and np.array_equal(got, want)


def test_resample_audio_rejects_bad_factor(spark):
    with pytest.raises(ValueError):
        resample_audio(spark.range(1).select("id"), factor=0)


def test_resample_audio_stereo_filters_per_channel(spark):
    """r12: stereo decimation deinterleaves, runs the SAME integer FIR on
    each channel independently (never across L/R), drops whole FRAMES,
    and reinterleaves — per-channel output equals the mono kernel run on
    that channel alone."""
    from ibc_spark.ext.multimodal import fir_decimation_taps, fir_lowpass_int

    rng = np.random.default_rng(23)
    left = rng.integers(-32768, 32512, size=97).astype(np.int16)
    right = rng.integers(-32768, 32512, size=97).astype(np.int16)
    inter = np.stack([left, right], axis=1).reshape(-1)
    df = spark.createDataFrame(
        [(1, bytes(encode_wav(inter, sample_rate=16000, channels=2)))],
        "doc_id long, payload binary",
    )
    payload = bytes(resample_audio(df, factor=4).collect()[0].payload)
    rate, ch, got = decode_audio(payload)
    taps = fir_decimation_taps(4)
    want_l = fir_lowpass_int(left.astype(np.int64), taps)[::4]
    want_r = fir_lowpass_int(right.astype(np.int64), taps)[::4]
    planes = got.reshape(-1, 2)
    assert rate == 4000 and ch == 2
    assert np.array_equal(planes[:, 0], want_l)
    assert np.array_equal(planes[:, 1], want_r)


def test_audio_entries_on_empty_corpus(spark, empty_sf):
    """Both registry faces are total on an empty documents table."""
    from ibc_spark.registry import QUERIES

    for name in ("multimodal_audio_features", "multimodal_audio_resample"):
        assert QUERIES[name](spark, empty_sf).count() == 0


def test_audio_features_channel_aware_stereo(spark):
    """Review fix: duration/n_samples count FRAMES and zero-crossings are
    per-channel — a stereo file must not double its duration or count
    sign flips across L/R boundaries."""
    import numpy as np

    from ibc_spark.ext.multimodal import encode_wav

    # 4 frames stereo at 8000 Hz: L = [+1,-1,+1,-1] (3 crossings),
    # R = [+5,+5,+5,+5] (0 crossings); interleaved L/R alternation would
    # wrongly count 7 cross-channel flips.
    inter = np.array([1, 5, -1, 5, 1, 5, -1, 5], dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytes(encode_wav(inter, sample_rate=8000, channels=2)))],
        "doc_id long, payload binary",
    )
    r = audio_features(df).collect()[0]
    assert r.n_samples == 4  # frames, not interleaved samples
    assert r.duration_ms == 4 * 1000 // 8000
    assert r.zero_crossings == 3
    assert r.peak_abs == 5 and r.sum_abs == 4 + 20


def test_audio_entries_adversarial_corpus_parity(spark, duck):
    """Review fixes pinned corpus-wide: empty text yields the all-zero row
    in BOTH arms (LEFT JOIN oracle), and non-ASCII text agrees because the
    waveform derives from CODEPOINTS, not UTF-8 bytes."""
    import os
    import tempfile

    from ibc_spark.registry import ORACLES, QUERIES
    from tests.parity import assert_parity

    tmp = tempfile.mkdtemp(prefix="ibc_audio_adv_")
    rows = [(1, "", "en", "s", 0), (2, "héllo wörld é", "fr", "s", 13), (3, "a", "en", "s", 1)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    for name in ("multimodal_audio_features", "multimodal_audio_resample"):
        assert_parity(name, QUERIES[name](spark, tmp), con, ORACLES[name])


def test_vad_segments_kernel_matches_reference(spark):
    """The vectorized run detection must equal a reference per-sample
    loop on a crafted waveform with edge-touching runs."""
    import numpy as np

    from ibc_spark.ext.multimodal import encode_wav, vad_segments

    # active at both edges, singleton runs, long middle run
    s = np.array(
        [20000, -1, 9000, 9000, -9000, 5, 0, -30000, 100, 8192], dtype=np.int16
    )
    df = spark.createDataFrame(
        [(1, bytes(encode_wav(s)))], "doc_id long, payload binary"
    )
    got = sorted(
        (r.seg_idx, r.start_frame, r.n_frames, r.seg_peak)
        for r in vad_segments(df).collect()
    )
    assert got == [(0, 0, 1, 20000), (1, 2, 3, 9000), (2, 7, 1, 30000), (3, 9, 1, 8192)]


def test_vad_segments_silence_and_junk_emit_nothing_stereo_per_channel(spark):
    import numpy as np

    from ibc_spark.ext.multimodal import encode_wav, vad_segments

    silent = bytes(encode_wav(np.array([1, -2, 3], dtype=np.int16)))
    # L = [30000, 0, 30000] (two singleton runs), R = [0, 30000, 0] (one)
    stereo = bytes(
        encode_wav(
            np.array([30000, 0, 0, 30000, 30000, 0], dtype=np.int16), channels=2
        )
    )
    df = spark.createDataFrame(
        [(1, silent), (2, stereo), (3, b"JUNK")], "doc_id long, payload binary"
    )
    got = sorted(
        (r.channel, r.seg_idx, r.start_frame, r.n_frames, r.seg_peak)
        for r in vad_segments(df).collect()
    )
    # r12: stereo segments per channel — an interleaved threshold would
    # have merged L's frame-0 run with R's frame-1 run
    assert got == [(0, 0, 0, 1, 30000), (0, 1, 2, 1, 30000), (1, 0, 1, 1, 30000)]


def test_vad_entry_on_empty_corpus(spark, empty_sf):
    from ibc_spark.registry import QUERIES

    assert QUERIES["multimodal_audio_vad_segments"](spark, empty_sf).count() == 0


def test_truncated_data_chunk_is_an_error_not_a_prefix_decode():
    """Review fix: a data chunk whose declared length extends past the
    payload end is a truncated file — must raise, never silently decode
    the prefix as if complete."""
    import struct

    import numpy as np

    wav = bytearray(encode_wav(np.array([1, 2, 3, 4, 5], dtype=np.int16)))
    # inflate the data chunk's declared length past the payload end
    data_hdr = bytes(wav).index(b"data")
    wav[data_hdr + 4 : data_hdr + 8] = struct.pack("<I", 1000)
    with pytest.raises(ValueError):
        decode_audio(bytes(wav))


def test_oversized_sample_rate_yields_null_row_not_task_failure(spark):
    """Review fix: the fmt rate field is uint32 but the feature column is
    int32 — a rate >= 2^31 must route to the NULL row, not fail the whole
    Arrow batch."""
    import struct

    import numpy as np

    wav = bytearray(encode_wav(np.array([100, -100], dtype=np.int16)))
    fmt_hdr = bytes(wav).index(b"fmt ")
    wav[fmt_hdr + 12 : fmt_hdr + 16] = struct.pack("<I", 0x80000000)  # rate field
    ok = bytes(encode_wav(np.array([7], dtype=np.int16)))
    df = spark.createDataFrame(
        [(1, bytes(wav)), (2, ok)], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in audio_features(df).collect()}
    assert rows[1].sample_rate is None and rows[1].n_samples is None
    assert rows[2].n_samples == 1  # the good row in the same batch survives


def test_streaming_audio_features_matches_batch(spark):
    """Batch/streaming parity of the full codec loop: the availableNow
    emission must equal the batch entry row-for-row, and re-invocation
    must be safe (fresh checkpoint + sink per run)."""
    from ibc_spark.registry import QUERIES

    from .conftest import SF_SMOKE

    batch_rows = QUERIES["multimodal_audio_features"](spark, SF_SMOKE).collect()
    batch = sorted(tuple(r) for r in batch_rows)
    for _ in range(2):  # re-invocation safety
        stream_rows = QUERIES["streaming_audio_features"](spark, SF_SMOKE).collect()
        # sorted full-row lists, not a doc_id-keyed dict: duplicate
        # emissions must fail, not collapse (review, r10)
        assert sorted(tuple(r) for r in stream_rows) == batch


def test_streaming_audio_features_on_empty_corpus(spark, empty_sf):
    from ibc_spark.registry import QUERIES

    assert QUERIES["streaming_audio_features"](spark, empty_sf).count() == 0


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=90
    ),
    lm=st.sampled_from([(3, 4), (2, 3), (3, 2), (1, 4), (4, 1)]),
)
@settings(max_examples=50, deadline=None)
def test_rational_kernel_matches_bruteforce_reference(samples, lm):
    """resample_rational_kernel == the literal modular-index spec the SQL
    oracle replays: y[j] = clip(floor(sum over n with (j*M+n)%L==0 of
    taps[n] * x[(j*M+n)/L] / SCALE)), zero-padded, ceil output length."""
    from ibc_spark.ext.multimodal import fir_rational_taps, resample_rational_kernel

    up, down = lm
    taps = fir_rational_taps(up, down)
    half = (len(taps) - 1) // 2
    x = [int(v) for v in samples]
    n_out = -(-len(x) * up // down)
    ref = []
    for j in range(n_out):
        acc = 0
        for k, n in enumerate(range(-half, half + 1)):
            u = j * down + n
            if u >= 0 and u % up == 0 and u // up < len(x):
                acc += int(taps[k]) * x[u // up]
        ref.append(int(np.clip(acc // FIR_SCALE, -32768, 32767)))
    got = resample_rational_kernel(np.asarray(x, dtype=np.int64), up, down)
    assert got.astype(np.int64).tolist() == ref


def test_rational_resample_rejects_nonintegral_rate(spark):
    from ibc_spark.ext.multimodal import resample_audio_rational

    # 16000 * 3 % 7 != 0 -> NULL row (mono and stereo alike)
    mono = bytes(encode_wav(np.arange(12, dtype=np.int16), sample_rate=16000))
    stereo = bytes(encode_wav(np.arange(12, dtype=np.int16), channels=2))
    df = spark.createDataFrame(
        [(1, mono), (2, stereo)], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in resample_audio_rational(df, up=3, down=7).collect()}
    assert rows[1].payload is None and rows[2].payload is None
    ok = {r.doc_id: r for r in resample_audio_rational(df, up=3, down=4).collect()}
    rate, _ch, y = decode_audio(bytes(ok[1].payload))
    assert rate == 12000 and len(y) == -(-12 * 3 // 4)


def test_rational_resample_stereo_per_channel(spark):
    """r12: stereo L/M resample == the mono kernel applied to each
    deinterleaved channel, reinterleaved (identical ceil length per
    channel)."""
    from ibc_spark.ext.multimodal import (
        resample_audio_rational,
        resample_rational_kernel,
    )

    rng = np.random.default_rng(29)
    left = rng.integers(-32768, 32512, size=41).astype(np.int16)
    right = rng.integers(-32768, 32512, size=41).astype(np.int16)
    inter = np.stack([left, right], axis=1).reshape(-1)
    df = spark.createDataFrame(
        [(1, bytes(encode_wav(inter, sample_rate=16000, channels=2)))],
        "doc_id long, payload binary",
    )
    payload = bytes(resample_audio_rational(df, up=3, down=4).collect()[0].payload)
    rate, ch, got = decode_audio(payload)
    want_l = resample_rational_kernel(left.astype(np.int64), 3, 4)
    want_r = resample_rational_kernel(right.astype(np.int64), 3, 4)
    planes = got.reshape(-1, 2)
    assert rate == 12000 and ch == 2
    assert np.array_equal(planes[:, 0], want_l)
    assert np.array_equal(planes[:, 1], want_r)


def test_spectral_vad_matches_bruteforce_reference(spark):
    """spectral_vad_frames == the literal per-frame integer-DFT spec the
    SQL oracle replays (floor-divided bin sums, squared, summed, 3/8
    in-band decision), partial tail frame dropped."""
    from ibc_spark.ext.multimodal import (
        SPECTRAL_COEF_SCALE,
        SPECTRAL_FRAME,
        SPECTRAL_THRESH_MULT,
        spectral_coef_tables,
        spectral_vad_frames,
    )

    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32512, size=100).astype(np.int16)  # 3 frames + tail
    df = spark.createDataFrame(
        [(1, bytes(encode_wav(s))), (2, b"JUNK")], "doc_id long, payload binary"
    )
    rows = sorted(spectral_vad_frames(df).collect(), key=lambda r: r.frame_idx)
    assert [r.doc_id for r in rows] == [1, 1, 1]
    C, D = spectral_coef_tables()
    for r in rows:
        fr = s[r.frame_idx * SPECTRAL_FRAME : (r.frame_idx + 1) * SPECTRAL_FRAME].astype(np.int64)
        a = np.floor_divide(C @ fr, SPECTRAL_COEF_SCALE)
        b = np.floor_divide(D @ fr, SPECTRAL_COEF_SCALE)
        band = int((a * a + b * b).sum())
        total = int((fr * fr).sum())
        assert (r.band_energy, r.total_energy) == (band, total)
        assert r.voiced == (band >= SPECTRAL_THRESH_MULT * total)


def test_spectral_vad_discriminates_tones(spark):
    """A pure in-band tone (2 kHz = bin 4) must be voiced; a pure
    out-of-band tone (8 kHz = Nyquist alternation) must not."""
    from ibc_spark.ext.multimodal import spectral_vad_frames

    n = np.arange(64)
    inband = np.rint(20000 * np.sin(2 * np.pi * 4 * n / 32)).astype(np.int16)
    outband = np.where(n % 2 == 0, 20000, -20000).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytes(encode_wav(inband))), (2, bytes(encode_wav(outband)))],
        "doc_id long, payload binary",
    )
    rows = {(r.doc_id, r.frame_idx): r.voiced for r in spectral_vad_frames(df).collect()}
    assert rows[(1, 0)] and rows[(1, 1)]
    assert not rows[(2, 0)] and not rows[(2, 1)]


def test_spectral_vad_stereo_per_channel(spark):
    """r12: stereo spectral VAD deinterleaves and scores each channel
    independently — rows carry an explicit channel index and equal the
    mono computation on that channel alone; an interleaved framing would
    mix L/R energy and fail."""
    from ibc_spark.ext.multimodal import (
        SPECTRAL_COEF_SCALE,
        SPECTRAL_FRAME,
        SPECTRAL_THRESH_MULT,
        spectral_coef_tables,
        spectral_vad_frames,
    )

    rng = np.random.default_rng(31)
    left = rng.integers(-32768, 32512, size=70).astype(np.int16)  # 2 frames + tail
    right = rng.integers(-32768, 32512, size=70).astype(np.int16)
    inter = np.stack([left, right], axis=1).reshape(-1)
    df = spark.createDataFrame(
        [(1, bytes(encode_wav(inter, channels=2)))], "doc_id long, payload binary"
    )
    rows = {(r.channel, r.frame_idx): r for r in spectral_vad_frames(df).collect()}
    assert set(rows) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    C, D = spectral_coef_tables()
    for c, chan in enumerate((left, right)):
        for f in range(2):
            fr = chan[f * SPECTRAL_FRAME : (f + 1) * SPECTRAL_FRAME].astype(np.int64)
            a = np.floor_divide(C @ fr, SPECTRAL_COEF_SCALE)
            b = np.floor_divide(D @ fr, SPECTRAL_COEF_SCALE)
            band = int((a * a + b * b).sum())
            total = int((fr * fr).sum())
            r = rows[(c, f)]
            assert (r.band_energy, r.total_energy) == (band, total)
            assert r.voiced == (band >= SPECTRAL_THRESH_MULT * total)


def test_attach_audio_stereo_derivation_and_mono_bit_unchanged(spark):
    """r12: channels=2 interleaves the documented per-channel formula
    (channel c adds c*53 to the mix); channels=1 stays BIT-IDENTICAL to
    the pre-r12 payload (the c*53 term vanishes at c=0) — the contract
    that keeps every green mono audio entry's hash stable."""
    df = spark.createDataFrame([(7, "abcDEF 123!")], "doc_id long, text string")
    mono = bytes(attach_audio(df).collect()[0].payload)
    b = np.frombuffer(b"abcDEF 123!", dtype=np.uint8).astype(np.int64)
    idx = np.arange(len(b))
    want_mono = ((((b * 37 + idx * 11) % 256) - 128) * 256).astype(np.int16)
    assert mono == bytes(encode_wav(want_mono, sample_rate=16000))
    stereo = bytes(attach_audio(df, channels=2).collect()[0].payload)
    rate, ch, got = decode_audio(stereo)
    planes = got.reshape(-1, 2)
    want_r = ((((b * 37 + idx * 11 + 53) % 256) - 128) * 256).astype(np.int16)
    assert rate == 16000 and ch == 2
    assert np.array_equal(planes[:, 0], want_mono)
    assert np.array_equal(planes[:, 1], want_r)
    with pytest.raises(ValueError):
        attach_audio(df, channels=0)


@given(
    frames=st.lists(
        st.tuples(
            st.integers(min_value=-32768, max_value=32767),
            st.integers(min_value=-32768, max_value=32767),
        ),
        min_size=0,
        max_size=60,
    ),
    factor=st.sampled_from([1, 2, 4]),
)
@settings(max_examples=15, deadline=None)
def test_stereo_resample_roundtrip_hypothesis(spark, frames, factor):
    """Property: for ANY stereo waveform, the Spark stereo decimation
    equals the mono kernel per deinterleaved channel — encode → resample
    → decode round-trips through the real container both ways. (The
    ``spark`` fixture is session-scoped, which hypothesis permits.)"""
    arr = np.array(frames, dtype=np.int16).reshape(-1, 2)
    inter = arr.reshape(-1)
    df = spark.createDataFrame(
        [(1, bytes(encode_wav(inter, sample_rate=16000, channels=2)))],
        "doc_id long, payload binary",
    )
    payload = bytes(resample_audio(df, factor=factor).collect()[0].payload)
    rate, ch, got = decode_audio(payload)
    taps = fir_decimation_taps(factor) if factor > 1 else None
    planes = got.reshape(-1, 2)
    for c in range(2):
        x = arr[:, c].astype(np.int64)
        want = (fir_lowpass_int(x, taps) if taps is not None else arr[:, c])[::factor]
        assert np.array_equal(planes[:, c], want)
    assert rate == 16000 // factor and ch == 2


@given(
    samples=st.lists(st.integers(min_value=-32768, max_value=32767), max_size=200),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_pcm24_roundtrip_is_lossless(samples, rate):
    """int16 → 24-bit (s<<8, 3-byte LE signed) → int16 (>>8) is the
    identity on the whole range — sign extension included."""
    from ibc_spark.ext.multimodal import encode_wav_pcm24

    s = np.asarray(samples, dtype=np.int16)
    got_rate, ch, out = decode_audio(encode_wav_pcm24(s, sample_rate=rate))
    assert got_rate == rate and ch == 1
    assert np.array_equal(out, s)


@given(
    samples=st.lists(st.integers(min_value=-32768, max_value=32767), max_size=200),
)
@settings(max_examples=60, deadline=None)
def test_pcm8_roundtrip_is_floor_quantizer(samples):
    """int16 → 8-bit unsigned (128-biased) → int16 equals
    ``floor(s/256)*256`` elementwise — arithmetic-shift floor semantics,
    including negatives (-1 → -256, not 0)."""
    from ibc_spark.ext.multimodal import encode_wav_pcm8

    s = np.asarray(samples, dtype=np.int16)
    _r, _c, out = decode_audio(encode_wav_pcm8(s))
    want = ((s.astype(np.int32) >> 8) << 8).astype(np.int16)
    assert np.array_equal(out, want)


def test_pcm8_24_stereo_and_ragged_chunks():
    """Both new variants carry channels through the header, and a ragged
    data chunk (half a 24-bit stereo frame) errors like the other
    formats."""
    import struct

    from ibc_spark.ext.multimodal import encode_wav_pcm8, encode_wav_pcm24

    s = np.array([-32768, -257, -1, 0, 255, 256, 32767, 1000], dtype=np.int16)
    for enc in (encode_wav_pcm8, encode_wav_pcm24):
        rate, ch, _ = decode_audio(enc(s, sample_rate=22050, channels=2))
        assert rate == 22050 and ch == 2
    wav = bytearray(encode_wav_pcm24(s, channels=2))
    data_hdr = bytes(wav).index(b"data")
    # shrink the data chunk by one byte: no longer a whole stereo frame
    (ln,) = struct.unpack_from("<I", bytes(wav), data_hdr + 4)
    wav[data_hdr + 4 : data_hdr + 8] = struct.pack("<I", ln - 1)
    del wav[-1:]
    with pytest.raises(ValueError, match="whole number of frames"):
        decode_audio(bytes(wav))


def test_float_pcm_nonfinite_samples_error():
    """NaN/Inf float samples would quantize platform-dependently — they
    take the errors-as-data seam (ValueError -> NULL row) instead."""
    for bad in (np.nan, np.inf, -np.inf):
        f = np.array([0.5, bad], dtype="<f4")
        with pytest.raises(ValueError, match="non-finite"):
            decode_audio(encode_wav_float(f, sample_rate=8000))


def test_new_audio_entries_on_empty_corpus(spark, empty_sf):
    """r11 registry faces are total on an empty documents table."""
    from ibc_spark.registry import QUERIES

    for name in (
        "multimodal_audio_float_pcm",
        "multimodal_audio_resample_rational",
        "multimodal_audio_vad_spectral",
        "multimodal_audio_stereo_resample",
        "multimodal_audio_stereo_resample_rational",
        "multimodal_audio_stereo_vad_spectral",
        "multimodal_audio_stereo_vad_segments",
        "multimodal_audio_pcm24",
        "multimodal_audio_pcm8",
    ):
        assert QUERIES[name](spark, empty_sf).count() == 0


def test_stereo_audio_entries_adversarial_corpus_parity(spark, duck):
    """r12 stereo entries on the adversarial corpus (empty text → all-zero
    feature row via the LEFT JOIN oracle; non-ASCII text → codepoint
    derivation agrees on both channels)."""
    import os
    import tempfile

    import duckdb

    from ibc_spark.registry import ORACLES, QUERIES
    from tests.parity import assert_parity

    tmp = tempfile.mkdtemp(prefix="ibc_audio_stereo_adv_")
    rows = [(1, "", "en", "s", 0), (2, "héllo wörld é", "fr", "s", 13), (3, "a", "en", "s", 1)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    for name in (
        "multimodal_audio_stereo_resample",
        "multimodal_audio_stereo_resample_rational",
        "multimodal_audio_stereo_vad_spectral",
        "multimodal_audio_stereo_vad_segments",
    ):
        assert_parity(name, QUERIES[name](spark, tmp), con, ORACLES[name])


# ---------------------------------------------------------------------------
# IMA ADPCM (format 0x11, r13) — the last closable WAVE format
# ---------------------------------------------------------------------------


@given(
    samples=st.lists(st.integers(min_value=-32768, max_value=32767), max_size=200),
    channels=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_adpcm_roundtrip_matches_scalar_reference(samples, channels, rate):
    """decode(encode_wav_adpcm(x)) equals the pure-scalar IMA recurrence
    (``ima_adpcm_reference``) on arbitrary waveforms — lossy but exactly
    deterministic, across block boundaries (33-frame blocks), partial
    final blocks, mono and stereo, and every sample rate."""
    from ibc_spark.ext.multimodal import encode_wav_adpcm, ima_adpcm_reference

    n = (len(samples) // channels) * channels
    s = np.asarray(samples[:n], dtype=np.int16)
    got_rate, ch, out = decode_audio(encode_wav_adpcm(s, sample_rate=rate, channels=channels))
    assert got_rate == rate and ch == channels
    ref = ima_adpcm_reference(s.reshape(-1, channels)).reshape(-1)
    assert np.array_equal(out, ref)


@given(samples=st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=150))
@settings(max_examples=40, deadline=None)
def test_adpcm_block_headers_store_verbatim_samples(samples):
    """Every block-start frame (i % 33 == 0) decodes EXACTLY — the header
    predictor is the verbatim int16 sample, so quantization error resets
    at each block boundary (the resync contract the oracle replays)."""
    from ibc_spark.ext.multimodal import ADPCM_SAMPLES_PER_BLOCK, encode_wav_adpcm

    s = np.asarray(samples, dtype=np.int16)
    _r, _c, out = decode_audio(encode_wav_adpcm(s))
    starts = np.arange(0, len(s), ADPCM_SAMPLES_PER_BLOCK)
    assert np.array_equal(out[starts], s[starts])


def test_adpcm_geometry_and_corruption_errors():
    """Corrupt ADPCM containers error loudly (errors-as-data seam): bad
    block geometry, missing fact chunk, out-of-range step index, ragged
    data chunk."""
    import struct

    from ibc_spark.ext.multimodal import encode_wav_adpcm

    s = np.arange(-40, 40, dtype=np.int16)
    wav = bytes(encode_wav_adpcm(s))

    # strip the fact chunk
    fpos = wav.index(b"fact")
    no_fact = wav[:fpos] + wav[fpos + 12 :]
    no_fact = no_fact[:4] + struct.pack("<I", len(no_fact) - 8) + no_fact[8:]
    with pytest.raises(ValueError, match="fact"):
        decode_audio(no_fact)

    # corrupt the step index in the first block header past 88
    b = bytearray(wav)
    dpos = wav.index(b"data")
    b[dpos + 8 + 2] = 99
    with pytest.raises(ValueError, match="index out of range"):
        decode_audio(bytes(b))

    # shrink the data chunk: no longer a whole number of blocks
    b = bytearray(wav)
    (ln,) = struct.unpack_from("<I", wav, dpos + 4)
    b[dpos + 4 : dpos + 8] = struct.pack("<I", ln - 1)
    del b[-1:]
    with pytest.raises(ValueError, match="whole number of blocks"):
        decode_audio(bytes(b))

    # fact count inconsistent with block count
    b = bytearray(wav)
    b[fpos + 8 : fpos + 12] = struct.pack("<I", 10_000)
    with pytest.raises(ValueError, match="fact count inconsistent"):
        decode_audio(bytes(b))


def test_adpcm_empty_and_single_sample():
    """Zero frames → empty decode; one frame → the verbatim header only."""
    from ibc_spark.ext.multimodal import encode_wav_adpcm

    _r, _c, out = decode_audio(encode_wav_adpcm(np.array([], dtype=np.int16)))
    assert len(out) == 0
    _r, _c, out = decode_audio(encode_wav_adpcm(np.array([-12345], dtype=np.int16)))
    assert np.array_equal(out, np.array([-12345], dtype=np.int16))


def test_adpcm_entry_on_empty_corpus(spark, empty_sf):
    from ibc_spark.registry import QUERIES

    assert QUERIES["multimodal_audio_adpcm"](spark, empty_sf).count() == 0
    assert QUERIES["multimodal_audio_stereo_adpcm"](spark, empty_sf).count() == 0


def test_adpcm_entry_adversarial_corpus_parity(spark, duck):
    """ADPCM registry entry on the adversarial corpus: empty text → the
    all-zero feature row via the LEFT JOIN oracle; non-ASCII text → the
    codepoint derivation and the recursive-CTE codec replay agree."""
    import os
    import tempfile

    import duckdb

    from ibc_spark.registry import ORACLES, QUERIES
    from tests.parity import assert_parity

    tmp = tempfile.mkdtemp(prefix="ibc_audio_adpcm_adv_")
    rows = [(1, "", "en", "s", 0), (2, "héllo wörld é", "fr", "s", 13), (3, "a", "en", "s", 1)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    for name in ("multimodal_audio_adpcm", "multimodal_audio_stereo_adpcm"):
        assert_parity(name, QUERIES[name](spark, tmp), con, ORACLES[name])


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law (format codes 7/6, r13) — telephony companding
# ---------------------------------------------------------------------------


def test_g711_spec_anchor_bytes():
    """The classic G.711 anchor bytes: mu-law silence 0xFF / max-negative
    0x00, A-law silence 0xD5 / max-positive 0xAA; decode of the silence
    bytes gives the spec values (0 for mu-law, +8 for A-law)."""
    from ibc_spark.ext.multimodal import (
        _alaw_decode_np,
        _alaw_encode_np,
        _mulaw_decode_np,
        _mulaw_encode_np,
    )

    assert _mulaw_encode_np([0])[0] == 0xFF
    assert _mulaw_encode_np([-32768])[0] == 0x00
    assert _alaw_encode_np([0])[0] == 0xD5
    assert _alaw_encode_np([32767])[0] == 0xAA
    assert _mulaw_decode_np([0xFF])[0] == 0
    assert _alaw_decode_np([0xD5])[0] == 8


@given(
    samples=st.lists(st.integers(min_value=-32768, max_value=32767), max_size=200),
    law=st.sampled_from(["mulaw", "alaw"]),
    channels=st.sampled_from([1, 2]),
)
@settings(max_examples=60, deadline=None)
def test_g711_container_roundtrip_matches_reference(samples, law, channels):
    """decode(encode_wav_g711(x)) equals the pure quantizer composition
    (``g711_reference``) — container fields, fact chunk, byte frames, and
    companding all pinned on arbitrary waveforms."""
    from ibc_spark.ext.multimodal import encode_wav_g711, g711_reference

    n = (len(samples) // channels) * channels
    s = np.asarray(samples[:n], dtype=np.int16)
    rate, ch, out = decode_audio(encode_wav_g711(s, law=law, sample_rate=8000, channels=channels))
    assert rate == 8000 and ch == channels
    assert np.array_equal(out, g711_reference(s, law))


def test_g711_quantizer_is_idempotent_and_bounded():
    """Decoded values are codec fixpoints (a second companding pass is the
    identity) and the quantization error is bounded by half the top
    segment step (mu-law ≤ 644 incl. the 32635 clip, A-law ≤ 512) —
    the two properties a lossy telephony codec must hold."""
    from ibc_spark.ext.multimodal import g711_reference

    s = np.arange(-32768, 32768, dtype=np.int32)
    for law, bound in (("mulaw", 644), ("alaw", 512)):
        d = g711_reference(s.astype(np.int16), law).astype(np.int32)
        assert int(np.abs(d - s).max()) <= bound, law
        d2 = g711_reference(d.astype(np.int16), law).astype(np.int32)
        assert np.array_equal(d, d2), law


def test_g711_entries_on_empty_corpus(spark, empty_sf):
    from ibc_spark.registry import QUERIES

    assert QUERIES["multimodal_audio_mulaw"](spark, empty_sf).count() == 0
    assert QUERIES["multimodal_audio_alaw"](spark, empty_sf).count() == 0


def test_g711_entries_adversarial_corpus_parity(spark, duck):
    """mu-law/A-law entries on the adversarial corpus (empty text, accented
    codepoints, single char) — the scalar SQL replay and the numpy kernel
    agree everywhere."""
    import os
    import tempfile

    import duckdb

    from ibc_spark.registry import ORACLES, QUERIES
    from tests.parity import assert_parity

    tmp = tempfile.mkdtemp(prefix="ibc_audio_g711_adv_")
    rows = [(1, "", "en", "s", 0), (2, "héllo wörld é", "fr", "s", 13), (3, "a", "en", "s", 1)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    for name in ("multimodal_audio_mulaw", "multimodal_audio_alaw"):
        assert_parity(name, QUERIES[name](spark, tmp), con, ORACLES[name])
