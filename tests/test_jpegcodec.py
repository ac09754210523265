"""Baseline JFIF codec contracts (round 14).

Two-sided attestation, same discipline as the WAVE/ADPCM suite:

1. EXACTNESS — the flat-per-MCU construction with all-ones quantization
   tables round-trips bit-exactly through the full pipeline (this is the
   property the ``multimodal_image_jpeg`` DuckDB oracle relies on).
2. REFERENCE PIN — on arbitrary content, quality-scaled tables, both
   subsamplings, grayscale, odd dimensions and restart intervals, the
   vectorized decoder is bit-identical to the independent scalar
   reference decoder (``jpeg_reference_decode``).
3. SEAMS — progressive/arithmetic frames, corrupt streams and truncation
   error loudly; the stream is standards-shaped (markers, stuffing).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ibc_spark.ext.jpegcodec import (
    AC_CHROMA_SPEC,
    AC_LUMA_SPEC,
    DC_CHROMA_SPEC,
    DC_LUMA_SPEC,
    _huff_encode_table,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    jpeg_reference_decode,
    quality_tables,
)

ONES = [1] * 64


def _flat_mcu_image(rng, mcus_y, mcus_x, mcu=16):
    colors = rng.integers(0, 256, size=(mcus_y, mcus_x, 3), dtype=np.uint8)
    return colors, np.repeat(np.repeat(colors, mcu, axis=0), mcu, axis=1)


def test_huffman_tables_are_complete_and_prefix_free():
    """Every symbol the encoder can emit has a code; canonical codes are
    prefix-free (no code is a prefix of a longer one)."""
    ac_need = {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)}
    for spec, need in [
        (DC_LUMA_SPEC, set(range(12))),
        (DC_CHROMA_SPEC, set(range(12))),
        (AC_LUMA_SPEC, ac_need),
        (AC_CHROMA_SPEC, ac_need),
    ]:
        tbl = _huff_encode_table(spec)
        assert need <= set(tbl)
        codes = {(ln, code) for code, ln in tbl.values()}
        assert len(codes) == len(tbl)
        as_bits = sorted(format(code, f"0{ln}b") for code, ln in tbl.values())
        for a, b in zip(as_bits, as_bits[1:]):
            assert not b.startswith(a), (a, b)


@given(
    my=st.integers(min_value=1, max_value=3),
    mx=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=40, deadline=None)
def test_flat_mcu_roundtrip_is_exact(my, mx, seed):
    """The oracle property: MCU-flat images + all-ones tables + 4:2:0 →
    decode equals the pinned-order YCbCr round trip of the input,
    pixel-for-pixel (the DCT/quant stage drops out exactly)."""
    rng = np.random.default_rng(seed)
    _colors, img = _flat_mcu_image(rng, my, mx)
    dec = decode_jpeg_baseline(
        encode_jpeg_baseline(img, quant_luma=ONES, quant_chroma=ONES, subsampling="420")
    )
    y, cb, cr = _rgb_to_ycbcr(img)
    exp = np.stack(_ycbcr_to_rgb(y, cb, cr), axis=-1)
    assert np.array_equal(dec, exp)


@given(seed=st.integers(min_value=0, max_value=2**31))
@settings(max_examples=30, deadline=None)
def test_flat_block_grayscale_roundtrip_is_identity(seed):
    """Grayscale skips the color transform entirely, so flat 8×8 blocks
    with ones tables are a BIT-EXACT identity — the strongest statement
    the integer IDCT contract makes."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quant_luma=ONES))
    assert np.array_equal(dec, img)


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    quality=st.sampled_from([25, 50, 75, 90, 100]),
    sub=st.sampled_from(["420", "444"]),
    dri=st.sampled_from([0, 1, 2]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_decoder_matches_scalar_reference_color(h, w, quality, sub, dri, seed):
    """The vectorized decoder is bit-identical to the independent scalar
    reference on arbitrary content — quality-scaled tables, both
    subsamplings, non-multiple-of-MCU dimensions, restart intervals."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = encode_jpeg_baseline(
        img, quality=quality, subsampling=sub, restart_interval=dri
    )
    assert np.array_equal(decode_jpeg_baseline(payload), jpeg_reference_decode(payload))


@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    quality=st.sampled_from([30, 75, 95]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=40, deadline=None)
def test_decoder_matches_scalar_reference_gray(h, w, quality, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    payload = encode_jpeg_baseline(img, quality=quality)
    assert np.array_equal(decode_jpeg_baseline(payload), jpeg_reference_decode(payload))


def test_lossy_fidelity_on_smooth_content():
    """Sanity that this is a REAL working JPEG, not merely self-consistent:
    smooth gradients survive quality 90 within a small error band, and
    the payload is smaller at lower quality."""
    yy, xx = np.mgrid[0:48, 0:48]
    img = np.stack(
        [np.clip(yy * 4, 0, 255), np.clip(xx * 4, 0, 255), np.clip(128 + yy - xx, 0, 255)],
        axis=-1,
    ).astype(np.uint8)
    p90 = encode_jpeg_baseline(img, quality=90, subsampling="420")
    p30 = encode_jpeg_baseline(img, quality=30, subsampling="420")
    d90 = decode_jpeg_baseline(p90)
    err = np.abs(d90.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() <= 12
    assert len(p30) < len(p90)


def test_quality_table_formula():
    """Published IJG scaling: q=50 is the Annex-K table itself; q=100 is
    all-ones; lower q scales up, clamped to 255."""
    ql50, qc50 = quality_tables(50)
    from ibc_spark.ext.jpegcodec import QUANT_CHROMA_STD, QUANT_LUMA_STD

    assert ql50 == list(QUANT_LUMA_STD) and qc50 == list(QUANT_CHROMA_STD)
    ql100, qc100 = quality_tables(100)
    assert set(ql100) == {1} and set(qc100) == {1}
    ql1, _ = quality_tables(1)
    assert max(ql1) == 255 and min(ql1) >= 1


def test_arithmetic_and_corrupt_streams_error_loudly():
    img = np.zeros((8, 8), dtype=np.uint8)
    payload = bytearray(encode_jpeg_baseline(img, quant_luma=ONES))
    # flip SOF0 (0xC0) to SOF9 (arithmetic-coded sequential) — the seam
    # that remains after r14 closed progressive (SOF2)
    pos = payload.index(bytes([0xFF, 0xC0]))
    payload[pos + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="arithmetic|non-baseline"):
        decode_jpeg_baseline(bytes(payload))

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"\x00\x01\x02")

    good = encode_jpeg_baseline(img, quant_luma=ONES)
    with pytest.raises(ValueError):
        decode_jpeg_baseline(good[:-8])  # truncated scan

    with pytest.raises(ValueError, match="quality"):
        encode_jpeg_baseline(img, quality=0)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg_baseline(np.zeros((8, 8, 3), np.uint8), subsampling="422x")
    with pytest.raises(ValueError, match="empty"):
        encode_jpeg_baseline(np.zeros((0, 8, 3), np.uint8))


def test_stream_shape_is_standard():
    """Marker skeleton: SOI, APP0/JFIF, n DQT, SOF0, DHT, SOS, EOI; all
    0xFF bytes inside the scan are stuffed or restart markers."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    p = encode_jpeg_baseline(img, quality=85, restart_interval=1)
    assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
    assert p[2:4] == b"\xff\xe0" and p[6:11] == b"JFIF\x00"
    assert bytes([0xFF, 0xDB]) in p and bytes([0xFF, 0xC0]) in p
    assert bytes([0xFF, 0xC4]) in p and bytes([0xFF, 0xDA]) in p
    assert bytes([0xFF, 0xDD]) in p  # DRI present
    # scan region: after SOS payload, every 0xFF is followed by 0x00,
    # a RSTn (D0-D7), or the final EOI
    sos = p.index(bytes([0xFF, 0xDA]))
    (seglen,) = struct.unpack_from(">H", p, sos + 2)
    i = sos + 2 + seglen
    while i < len(p) - 1:
        if p[i] == 0xFF:
            assert p[i + 1] == 0x00 or 0xD0 <= p[i + 1] <= 0xD7 or p[i + 1] == 0xD9
            i += 2
        else:
            i += 1


def test_decode_image_routes_jpeg():
    """decode_image dispatches SOI-tagged payloads to the JPEG decoder and
    replicates grayscale to 3 channels; the removed seam no longer fires."""
    from ibc_spark.ext.multimodal import decode_image

    rng = np.random.default_rng(11)
    colors, img = _flat_mcu_image(rng, 1, 2)
    p = encode_jpeg_baseline(img, quant_luma=ONES, quant_chroma=ONES, subsampling="420")
    assert decode_image(p).shape == (16, 32, 3)

    gray = np.repeat(np.repeat(rng.integers(0, 256, (1, 1), np.uint8), 8, 0), 8, 1)
    gp = encode_jpeg_baseline(gray, quant_luma=ONES)
    out = decode_image(gp)
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out[..., 0], gray)
    assert np.array_equal(out[..., 0], out[..., 1]) and np.array_equal(out[..., 1], out[..., 2])


# ---------------------------------------------------------------------------
# Progressive JPEG (round 14)
# ---------------------------------------------------------------------------

from ibc_spark.ext.jpegcodec import (  # noqa: E402
    PROG_AC_SPEC,
    encode_jpeg_progressive,
)


def test_prog_ac_table_is_complete():
    tbl = _huff_encode_table(PROG_AC_SPEC)
    need = (
        {r << 4 for r in range(15)}
        | {0xF0}
        | {(r << 4) | s for r in range(16) for s in range(1, 11)}
    )
    assert need == set(tbl)
    # flat 8-bit canonical: last code must stay below the all-ones code
    assert max(code for code, _ln in tbl.values()) < 0xFF


@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    quality=st.sampled_from([25, 50, 75, 90, 100]),
    sub=st.sampled_from(["420", "444"]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_progressive_equals_baseline_color(h, w, quality, sub, seed):
    """The cross-validation progressive decoding rests on: after all scans
    the accumulated coefficients ARE the baseline quantized coefficients,
    so two completely different entropy paths (interleaved single-scan vs
    spectral bands + successive approximation with EOB runs and
    correction bits) must reconstruct bit-identically."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    db = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=quality, subsampling=sub))
    dp = decode_jpeg_baseline(encode_jpeg_progressive(img, quality=quality, subsampling=sub))
    assert np.array_equal(db, dp)


@given(
    h=st.integers(min_value=1, max_value=32),
    w=st.integers(min_value=1, max_value=32),
    quality=st.sampled_from([30, 75, 95]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=30, deadline=None)
def test_progressive_equals_baseline_gray(h, w, quality, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    db = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=quality))
    dp = decode_jpeg_baseline(encode_jpeg_progressive(img, quality=quality))
    assert np.array_equal(db, dp)


def test_progressive_smooth_content_exercises_eob_runs():
    """A smooth gradient zeroes most high-band blocks — the EOBn path
    (runs far beyond 1) must round-trip; verified against baseline."""
    yy, xx = np.mgrid[0:64, 0:64]
    img = np.stack(
        [np.clip(yy * 4, 0, 255), np.clip(xx * 4, 0, 255), np.full_like(yy, 77)],
        axis=-1,
    ).astype(np.uint8)
    p = encode_jpeg_progressive(img, quality=75)
    assert np.array_equal(
        decode_jpeg_baseline(p),
        decode_jpeg_baseline(encode_jpeg_baseline(img, quality=75)),
    )
    assert p[:2] == b"\xff\xd8"
    # really is SOF2
    assert bytes([0xFF, 0xC2]) in p


@given(seed=st.integers(min_value=0, max_value=2**31))
@settings(max_examples=20, deadline=None)
def test_progressive_flat_mcu_is_exact(seed):
    """The oracle-grade property carries over: MCU-flat images with
    all-ones tables decode exactly through the progressive path too."""
    rng = np.random.default_rng(seed)
    colors, img = _flat_mcu_image(rng, 2, 2)
    ones = [1] * 64
    dec = decode_jpeg_baseline(
        encode_jpeg_progressive(img, quant_luma=ones, quant_chroma=ones, subsampling="420")
    )
    y, cb, cr = _rgb_to_ycbcr(img)
    assert np.array_equal(dec, np.stack(_ycbcr_to_rgb(y, cb, cr), axis=-1))


def test_progressive_custom_scan_script():
    """A nonstandard but legal script (single AC band, no refinement)
    decodes identically to baseline at full precision."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    script = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    p = encode_jpeg_progressive(img, quality=85, scans=script)
    assert np.array_equal(
        decode_jpeg_baseline(p),
        decode_jpeg_baseline(encode_jpeg_baseline(img, quality=85)),
    )
