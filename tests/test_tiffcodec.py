"""Baseline TIFF contracts (round 14): IFD container, TIFF-variant LZW
(MSB-first, early change), PackBits, horizontal-differencing predictor,
multi-strip coverage, big-endian decode, loud seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ibc_spark.ext.multimodal import decode_image
from ibc_spark.ext.tiffcodec import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
    tiff_lzw_decode,
    tiff_lzw_encode,
)


@given(
    n=st.integers(min_value=0, max_value=3000),
    alpha=st.sampled_from([2, 8, 256]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_lzw_and_packbits_roundtrip(n, alpha, seed):
    rng = np.random.default_rng(seed)
    d = rng.integers(0, alpha, n).astype(np.uint8).tobytes()
    assert tiff_lzw_decode(tiff_lzw_encode(d), n) == d
    assert packbits_decode(packbits_encode(d), n) == d


def test_lzw_early_change_boundary_and_reclear():
    """A long low-entropy stream crosses every code-width boundary under
    the early-change convention and forces the table-full re-CLEAR."""
    d = bytes(np.tile(np.arange(6, dtype=np.uint8), 30000))
    assert tiff_lzw_decode(tiff_lzw_encode(d), len(d)) == d


@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    comp=st.sampled_from(["none", "lzw", "packbits"]),
    pred=st.booleans(),
    rps=st.sampled_from([1, 4, 64]),
    gray=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=80, deadline=None)
def test_tiff_container_roundtrip(h, w, comp, pred, rps, gray, seed):
    if pred and comp == "none":
        pred = False
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = decode_tiff(encode_tiff(img, compression=comp, predictor=pred, rows_per_strip=rps))
    exp = img if not gray else np.repeat(img[:, :, None], 3, axis=2)
    assert np.array_equal(dec, exp)


def test_tiff_big_endian_decode():
    """Hand-built MM (big-endian) 2x2 grayscale, uncompressed: the
    decoder must honor the byte order for every field."""
    px = bytes([10, 20, 30, 40])
    # header(8) + IFD(2 + 5*12 + 4 = 66) -> data at 74
    ifd = struct.pack(">H", 5)
    ifd += struct.pack(">HHI", 256, 3, 1) + struct.pack(">H", 2) + b"\x00\x00"
    ifd += struct.pack(">HHI", 257, 3, 1) + struct.pack(">H", 2) + b"\x00\x00"
    ifd += struct.pack(">HHI", 273, 4, 1) + struct.pack(">I", 74)
    ifd += struct.pack(">HHI", 278, 3, 1) + struct.pack(">H", 2) + b"\x00\x00"
    ifd += struct.pack(">HHI", 279, 4, 1) + struct.pack(">I", 4)
    ifd += struct.pack(">I", 0)
    payload = b"MM\x00*" + struct.pack(">I", 8) + ifd + px
    dec = decode_tiff(payload)
    assert np.array_equal(dec[:, :, 0], np.array([[10, 20], [30, 40]], np.uint8))
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])


def test_tiff_seams_and_errors():
    img = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="compression"):
        encode_tiff(img, compression="jpeg")
    with pytest.raises(ValueError, match="predictor"):
        encode_tiff(img, compression="none", predictor=True)
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"NOPE")
    p = bytearray(encode_tiff(img))
    # flip compression tag value to 7 (JPEG-in-TIFF) -> loud seam
    # (tag 259 short value sits right after its 8-byte entry header)
    idx = p.index(struct.pack("<HHI", 259, 3, 1))
    p[idx + 8] = 7
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff(bytes(p))
    # truncated LZW strip
    good = encode_tiff(np.arange(48, dtype=np.uint8).reshape(4, 4, 3), compression="lzw")
    with pytest.raises(ValueError, match="truncated"):
        decode_tiff(good[:-3])


def test_decode_image_routes_tiff():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (5, 6, 3), np.uint8)
    assert np.array_equal(decode_image(encode_tiff(img, compression="packbits")), img)
