"""FLAC codec contracts (round 14): lossless round-trips over every
encoder mode (fixed predictors, trivial-LPC emission, wasted-bits
detection, Rice partition orders, mid/side stereo), bit primitives
(zigzag Rice, UTF-8 numbers, CRCs), container verification (CRC-8/16
rejection, MD5 mismatch), and multi-frame block coverage."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ibc_spark.ext.flaccodec import (
    _BR,
    _BW,
    _crc8,
    _crc16,
    _read_utf8_number,
    _rice_decode,
    _rice_encode,
    _utf8_number,
    decode_flac,
    encode_flac,
)


@given(
    vals=st.lists(st.integers(min_value=-(2**17), max_value=2**17), max_size=200),
    param=st.integers(min_value=0, max_value=14),
)
@settings(max_examples=60, deadline=None)
def test_rice_roundtrip(vals, param):
    bw = _BW()
    _rice_encode(bw, vals, param)
    bw.align()
    assert _rice_decode(_BR(bytes(bw.buf)), len(vals), param) == vals


@given(n=st.integers(min_value=0, max_value=2**35))
@settings(max_examples=80, deadline=None)
def test_utf8_number_roundtrip(n):
    assert _read_utf8_number(_BR(_utf8_number(n))) == n


@given(
    n=st.integers(min_value=1, max_value=600),
    stereo=st.booleans(),
    mid_side=st.booleans(),
    force_lpc=st.booleans(),
    porder=st.sampled_from([0, 2]),
    mode=st.sampled_from(["noise", "smooth", "const", "wasted"]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=80, deadline=None)
def test_flac_roundtrip_matrix(n, stereo, mid_side, force_lpc, porder, mode, seed):
    """decode(encode(x)) == x across every encoder mode and content
    class — noise (verbatim-ish residuals), smooth (fixed predictors
    win), constant blocks, wasted-bit waveforms."""
    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    if mode == "noise":
        x = rng.integers(-32768, 32768, shape)
    elif mode == "smooth":
        x = np.cumsum(rng.integers(-20, 21, shape), axis=0).clip(-32768, 32767)
    elif mode == "const":
        x = np.full(shape, int(rng.integers(-32768, 32768)))
    else:
        x = rng.integers(-128, 128, shape) * 256
    p = encode_flac(
        x,
        block_size=256,
        mid_side=mid_side and stereo,
        force_lpc=force_lpc,
        partition_order=porder,
    )
    rate, dec = decode_flac(p)
    assert rate == 16000
    exp = x if stereo else x[:, None]
    assert np.array_equal(dec, exp)


def test_flac_compresses_smooth_content():
    rng = np.random.default_rng(5)
    x = np.cumsum(rng.integers(-30, 31, 8000)).clip(-32768, 32767)
    assert len(encode_flac(x)) < 0.55 * x.size * 2


def test_flac_crc_and_md5_rejection():
    rng = np.random.default_rng(6)
    x = rng.integers(-1000, 1000, 500)
    p = bytearray(encode_flac(x))
    # flip a byte in the last frame's audio data -> CRC-16 must fire
    p[-4] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-16|CRC-8|truncated|sync"):
        decode_flac(bytes(p))
    # corrupt the header CRC-8 byte region: flip a header bit after sync
    p2 = bytearray(encode_flac(x))
    hdr = p2.index(b"\xff\xf8", 42)
    p2[hdr + 2] ^= 0x01
    with pytest.raises(ValueError, match="CRC-8|CRC-16|reserved|sync"):
        decode_flac(bytes(p2))
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"NOPE")


def test_flac_crc_primitives():
    # spec polynomials: CRC-8 x^8+x^2+x+1, CRC-16 x^16+x^15+x^2+1
    assert _crc8(b"") == 0 and _crc16(b"") == 0
    assert _crc8(b"\x00") == 0
    assert _crc8(b"\x01") == 0x07
    assert _crc16(b"123456789") == 0xFEE8  # CRC-16/BUYPASS check value


def test_flac_empty_and_single_sample():
    rate, dec = decode_flac(encode_flac(np.zeros(0, np.int64)))
    assert dec.shape == (0, 1)
    rate, dec = decode_flac(encode_flac(np.array([-32768])))
    assert dec[0, 0] == -32768


def test_flac_streaminfo_md5_is_real():
    import hashlib

    x = np.arange(-50, 50, dtype=np.int64)
    p = encode_flac(x)
    # STREAMINFO md5 sits at bytes 8+18 .. 8+34 (marker 4 + block hdr 4)
    md5 = p[8 + 18 : 8 + 34]
    assert md5 == hashlib.md5(x.astype("<i2").tobytes()).digest()


def test_rice_decode_vectorized_equals_reference_arms():
    """r16: the binary-lifting vectorized Rice decoder must be bit-exact
    with BOTH reference arms (scalar reader walk, bigint local-state walk)
    across the paths it dispatches through: the n<128 bigint dispatch, the
    lifted path, the window-extension retry (pathological quotients), and
    mid-stream continuation (reader bit position must land identically)."""
    import random

    from ibc_spark.ext.flaccodec import _BW, _BR, _rice_decode_bigint

    rng = random.Random(99)
    cases = [
        (0, [0]),                      # param 0, single zero
        (0, [7, -7, 1, -1] * 80),      # param 0, lifted path
        (3, list(range(-64, 64))),     # small n -> bigint dispatch
        (4, [0] * 300),                # all-zero residuals, lifted
        (2, [1 << 14, -(1 << 14)] * 100),  # huge quotients -> extension
        (11, [rng.randint(-5000, 5000) for _ in range(513)]),
    ]
    for param, vals in cases:
        bw = _BW()
        _rice_encode(bw, vals, param)
        bw.write(0, 7)  # unaligned tail so continuation offsets matter
        data = bytes(bw.buf)
        ra, rb = _BR(data), _BR(data)
        assert _rice_decode(ra, len(vals), param) == vals
        assert _rice_decode_bigint(rb, len(vals), param) == vals
        assert ra.bit_offset() == rb.bit_offset()
        # truncated stream raises on both arms (only meaningful when the
        # cut actually removes bits the decode needs)
        cut = data[: max(1, len(data) // 4)]
        if ra.bit_offset() > len(cut) * 8:
            for fn in (_rice_decode, _rice_decode_bigint):
                with pytest.raises(ValueError, match="truncated"):
                    fn(_BR(cut), len(vals), param)
