"""GIF87a/89a + LZW contracts (round 14).

LZW is the third distinct entropy machine in the media stack; the
contracts mirror the JPEG/RLE suites: lossless round-trips over
arbitrary content (including the table-growth boundaries and the
table-full re-CLEAR path), container features (animation compositing,
transparency, interlacing, local color tables), wild-stream tolerance
(deferred clear, missing EOI), and loud errors on corrupt input.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ibc_spark.ext.gifcodec import decode_gif, encode_gif, lzw_decode, lzw_encode
from ibc_spark.ext.multimodal import decode_image, default_rle_palette


@given(
    m=st.integers(min_value=2, max_value=8),
    n=st.integers(min_value=0, max_value=4000),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=80, deadline=None)
def test_lzw_roundtrip_arbitrary(m, n, seed):
    """decode(encode(x)) == x for every alphabet size and length —
    random content crosses every code-width boundary by n ~ 4000."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 1 << m, n).astype(np.uint8)
    assert bytes(lzw_decode(lzw_encode(px, m), m)) == px.tobytes()


def test_lzw_table_full_reclear_roundtrip():
    """Low-entropy input fills the 4096-entry table; the encoder must
    emit CLEAR and rebuild, and the decoder must follow."""
    px = np.tile(np.arange(4, dtype=np.uint8), 40000)
    assert bytes(lzw_decode(lzw_encode(px, 2), 2)) == px.tobytes()


def test_lzw_kwkwk_case():
    """The classic aaa... stream forces code == next (the KwKwK corner)
    immediately."""
    px = np.zeros(50, dtype=np.uint8)
    assert bytes(lzw_decode(lzw_encode(px, 2), 2)) == px.tobytes()


def test_lzw_deferred_clear_and_missing_eoi_tolerated():
    """Wild streams: data ending without EOI must still decode what is
    there instead of raising (real-world encoders truncate)."""
    px = np.arange(16, dtype=np.uint8) % 4
    enc = lzw_encode(px, 2)
    got = lzw_decode(enc[:-1], 2)  # drop the tail byte holding EOI bits
    assert px.tobytes().startswith(bytes(got)) and len(got) >= len(px) - 8


@given(
    n=st.integers(min_value=1, max_value=4),
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    k=st.sampled_from([2, 4, 16, 256]),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_gif_container_roundtrip(n, h, w, k, interlace, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (k, 3), np.uint8)
    fr = rng.integers(0, k, (n, h, w), np.uint8)
    delays, dec = decode_gif(encode_gif(fr, pal, delay_cs=3, interlace=interlace))
    assert delays == [3] * n
    assert np.array_equal(dec, pal[fr])


def test_gif_transparency_composites_previous_frame():
    pal = default_rle_palette()
    fr = np.zeros((2, 4, 4), np.uint8)
    fr[0] = 5
    fr[1] = 7
    fr[1, 0, 0] = 9
    _d, dec = decode_gif(encode_gif(fr, pal, transparent=7))
    exp0 = pal[fr[0]]
    exp1 = exp0.copy()
    exp1[0, 0] = pal[9]  # index 7 is transparent → frame-0 pixels persist
    assert np.array_equal(dec[0], exp0)
    assert np.array_equal(dec[1], exp1)


def test_gif_subrect_and_local_color_table():
    """Hand-built stream: a 2×2 sub-rect image with a LOCAL color table
    draws at (1,1) on the global-background canvas."""
    gpal = np.zeros((2, 3), np.uint8)
    gpal[1] = (10, 20, 30)
    base = encode_gif(np.zeros((1, 4, 4), np.uint8), gpal)  # canvas template
    lpal = np.array([[200, 0, 0], [0, 200, 0]], np.uint8)
    sub = np.array([[0, 1], [1, 0]], np.uint8)
    body = bytearray()
    body += bytes([0x2C]) + struct.pack("<HHHH", 1, 1, 2, 2)
    body += bytes([0x80 | 0x00])  # LCT present, 2 entries
    body += lpal.tobytes()
    body += bytes([2])
    enc = lzw_encode(sub.reshape(-1), 2)
    body += bytes([len(enc)]) + enc + bytes([0])
    payload = base[:-1] + bytes(body) + b"\x3b"
    _d, frames = decode_gif(payload)
    assert frames.shape[0] == 2
    region = frames[1][1:3, 1:3]
    assert np.array_equal(region, lpal[sub])
    assert np.array_equal(frames[1][0, 0], gpal[0])  # outside the sub-rect


def test_gif_errors_and_decode_image_route():
    pal = default_rle_palette()
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF")
    with pytest.raises(ValueError, match="palette"):
        encode_gif(np.full((1, 2, 2), 250, np.uint8), pal[:16])
    with pytest.raises(ValueError, match="2\\^k"):
        encode_gif(np.zeros((1, 2, 2), np.uint8), pal[:3])
    fr = np.arange(16, dtype=np.uint8).reshape(1, 4, 4)
    img = decode_image(encode_gif(fr, pal))
    assert np.array_equal(img, pal[fr[0]])


def test_gif_disposal_restore_to_previous():
    """Disposal method 3 restores the pre-frame canvas: a frame drawn
    with disposal 3 must NOT leak into the composition of the next frame
    (ADVICE r14 — it was silently treated as disposal 'none')."""
    pal = default_rle_palette()
    fr0 = np.full((4, 4), 5, np.uint8)
    base = encode_gif(fr0[None, :, :], pal)

    # append a hand-built frame: GCE with disposal 3, full-frame image of
    # index 9, then a third frame of transparent pixels (keeps canvas)
    body = bytearray()
    body += bytes([0x21, 0xF9, 4, (3 << 2) | 0x00]) + struct.pack("<H", 4) + bytes([0, 0])
    body += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 4, 4) + bytes([0x00])
    enc = lzw_encode(np.full(16, 9, np.uint8), 8)
    body += bytes([8, len(enc)]) + enc + bytes([0])
    # frame 3: transparent overwrite (index 7 transparent, all-7 frame)
    body += bytes([0x21, 0xF9, 4, 0x01]) + struct.pack("<H", 4) + bytes([7, 0])
    body += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 4, 4) + bytes([0x00])
    enc2 = lzw_encode(np.full(16, 7, np.uint8), 8)
    body += bytes([8, len(enc2)]) + enc2 + bytes([0])
    payload = base[:-1] + bytes(body) + b"\x3b"

    _d, frames = decode_gif(payload)
    assert frames.shape[0] == 3
    assert np.array_equal(frames[1], np.broadcast_to(pal[9], (4, 4, 3)))
    # disposal 3 restored frame 0's canvas, so the all-transparent frame 3
    # shows frame 0's pixels, not frame 1's
    assert np.array_equal(frames[2], pal[fr0])
