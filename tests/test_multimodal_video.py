"""RIFF/AVI video-container contracts (round 13): the uncompressed-DIB
codec loop must be a lossless identity over arbitrary frame stacks
(dimensions, DWORD row padding, frame counts), header fields must
cross-validate, compressed streams must hit the documented entropy seam,
and the registry entry's position-weighted checksum must actually detect
the classic container bugs (row flip, BGR swap)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ibc_spark.ext.multimodal import decode_avi, encode_avi_raw


@given(
    n=st.integers(min_value=0, max_value=6),
    h=st.integers(min_value=1, max_value=6),
    w=st.integers(min_value=1, max_value=6),
    fps=st.sampled_from([1, 10, 24, 30]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=80, deadline=None)
def test_avi_roundtrip_is_lossless(n, h, w, fps, seed):
    """decode(encode(frames)) is the identity for every stack shape —
    including widths whose 3-byte rows need DWORD padding (w % 4 != 0),
    the classic stride bug surface."""
    rng = np.random.default_rng(seed)
    fr = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    got_fps, dec = decode_avi(encode_avi_raw(fr, fps=fps))
    assert got_fps == fps
    assert dec.shape == fr.shape
    assert np.array_equal(dec, fr)


def test_avi_header_cross_validation():
    """Corrupt containers error loudly: frame count vs dwTotalFrames,
    strf-vs-avih dimensions, truncated chunks, short DIB planes."""
    fr = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3) % 256
    wav = encode_avi_raw(fr, fps=10)

    # inflate dwTotalFrames (offset: avih data starts after
    # RIFF(12) + LIST hdr(12) = 24 + chunk hdr(8) = 32; dwTotalFrames is
    # the 5th uint32 of avih)
    b = bytearray(wav)
    pos = wav.index(b"avih") + 8 + 16
    b[pos : pos + 4] = struct.pack("<I", 99)
    with pytest.raises(ValueError, match="frame count"):
        decode_avi(bytes(b))

    # strf width disagrees with avih
    b = bytearray(wav)
    pos = wav.index(b"strf") + 8 + 4
    b[pos : pos + 4] = struct.pack("<i", 5)
    with pytest.raises(ValueError, match="dimensions disagree"):
        decode_avi(bytes(b))

    # truncated file
    with pytest.raises(ValueError, match="truncated"):
        decode_avi(wav[:-10])

    # compression code != BI_RGB → the documented entropy seam
    b = bytearray(wav)
    pos = wav.index(b"strf") + 8 + 16
    b[pos : pos + 4] = struct.pack("<I", 0x34363248)  # 'H264'
    with pytest.raises(NotImplementedError, match="media library"):
        decode_avi(bytes(b))

    # not an AVI
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_avi_checksum_detects_flip_and_bgr_swap():
    """The registry checksum's reason to exist: a decoder that forgot the
    bottom-up flip or the BGR→RGB swap yields the same pixel SUM but a
    different position-weighted checksum."""
    rng = np.random.default_rng(7)
    fr = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    weights = np.arange(1, 4 * 4 * 3 + 1, dtype=np.int64)

    def csum(a):
        return int((a.reshape(-1).astype(np.int64) * weights).sum())

    flipped = fr[::-1]
    swapped = fr[:, :, ::-1]
    assert csum(fr) != csum(flipped)
    assert csum(fr) != csum(swapped)
    assert int(fr.sum()) == int(flipped.sum()) == int(swapped.sum())


def test_attach_video_pixel_derivation(spark):
    """attach_video's frames equal the documented codepoint formula after
    a REAL container round-trip — per frame, per pixel, per channel."""
    from ibc_spark.ext.multimodal import attach_video

    rows = [(1, "Ab"), (2, "")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: bytes(r.payload) for r in attach_video(docs).collect()}
    fps, frames = decode_avi(got[1])
    assert fps == 10 and frames.shape == (2, 4, 4, 3)
    for t, ch in enumerate("Ab", start=1):
        for y in range(4):
            for x in range(4):
                for c in range(3):
                    want = (ord(ch) * 7 + y * 13 + x * 17 + c * 29 + (t - 1) * 3) % 256
                    assert frames[t - 1, y, x, c] == want
    _fps, empty = decode_avi(got[2])
    assert empty.shape[0] == 0


def test_video_frames_entry_on_empty_corpus(spark, empty_sf):
    from ibc_spark.registry import QUERIES

    assert QUERIES["multimodal_video_frames"](spark, empty_sf).count() == 0


def test_video_frames_entry_adversarial_corpus_parity(spark, duck):
    """Empty text → zero frames → zero rows on BOTH arms; non-ASCII
    codepoints drive the same pixel formula in numpy and SQL."""
    import os
    import tempfile

    import duckdb

    from ibc_spark.registry import ORACLES, QUERIES
    from tests.parity import assert_parity

    tmp = tempfile.mkdtemp(prefix="ibc_video_adv_")
    rows = [(1, "", "en", "s", 0), (2, "héllo wörld é", "fr", "s", 13), (3, "a", "en", "s", 1)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    name = "multimodal_video_frames"
    assert_parity(name, QUERIES[name](spark, tmp), con, ORACLES[name])


def test_scene_cut_kernel_matches_bruteforce(spark):
    """scene_cut_frames == the literal per-transition spec: L1 over all
    48 pixel positions, >= threshold flag, first frame excluded."""
    from ibc_spark.ext.multimodal import (
        SCENE_CUT_L1_THRESHOLD,
        attach_video,
        scene_cut_frames,
    )

    docs = spark.createDataFrame([(1, "AaAz"), (2, "x"), (3, "")], ["doc_id", "text"])
    got = {
        (r.doc_id, r.frame_idx): (r.l1_diff, r.is_cut)
        for r in scene_cut_frames(attach_video(docs)).collect()
    }
    # 0/1-frame videos emit no transitions
    assert all(k[0] == 1 for k in got)
    for t in (1, 2, 3):
        ref = 0
        for y in range(4):
            for x in range(4):
                for c in range(3):
                    base = y * 13 + x * 17 + c * 29
                    a = (ord("AaAz"[t]) * 7 + base + t * 3) % 256
                    b = (ord("AaAz"[t - 1]) * 7 + base + (t - 1) * 3) % 256
                    ref += abs(a - b)
        assert got[(1, t)] == (ref, ref >= SCENE_CUT_L1_THRESHOLD), t


def test_scene_cut_entry_on_empty_corpus(spark, empty_sf):
    from ibc_spark.registry import QUERIES

    assert QUERIES["multimodal_video_scene_cuts"](spark, empty_sf).count() == 0


def test_scene_cut_entry_adversarial_corpus_parity(spark, duck):
    import os
    import tempfile

    import duckdb

    from ibc_spark.registry import ORACLES, QUERIES
    from tests.parity import assert_parity

    tmp = tempfile.mkdtemp(prefix="ibc_video_cuts_adv_")
    rows = [(1, "", "en", "s", 0), (2, "héllo wörld é", "fr", "s", 13), (3, "a", "en", "s", 1)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    name = "multimodal_video_scene_cuts"
    assert_parity(name, QUERIES[name](spark, tmp), con, ORACLES[name])


def test_frame_dedup_finds_planted_duplicates(spark):
    """Two docs sharing a char at the same position produce the SAME frame
    (the formula depends only on (codepoint, t)); the dedup entry must
    group them, and unique frames must not appear."""
    from ibc_spark.ext.multimodal import attach_video, video_frame_features
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "abc"), (2, "axc"), (3, "zzz")], ["doc_id", "text"]
    )
    feats = video_frame_features(attach_video(docs))
    groups = (
        feats.groupBy("checksum", "sum_pix")
        .agg(F.count(F.lit(1)).alias("n_frames"), F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_frames") > 1)
        .collect()
    )
    # planted dups: 'a'@t=1 and 'c'@t=3 shared by docs 1/2 -> two groups
    # of (n_frames=2, n_docs=2); doc 3's 'z'@{1,2,3} are three DISTINCT
    # frames (the t term shifts pixels), so no intra-doc group
    assert sorted((g.n_frames, g.n_docs) for g in groups) == [(2, 2), (2, 2)]


def test_frame_dedup_entry_on_empty_corpus(spark, empty_sf):
    from ibc_spark.registry import QUERIES

    assert QUERIES["multimodal_video_frame_dedup"](spark, empty_sf).count() == 0


# ---------------------------------------------------------------------------
# MS-RLE8 compressed AVI (round 14)
# ---------------------------------------------------------------------------

from ibc_spark.ext.multimodal import (  # noqa: E402
    _rle8_decode_plane,
    _rle8_encode_plane,
    default_rle_palette,
    encode_avi_rle8,
)


@given(
    n=st.integers(min_value=0, max_value=5),
    h=st.integers(min_value=1, max_value=10),
    w=st.integers(min_value=1, max_value=10),
    maxval=st.sampled_from([1, 4, 255]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=80, deadline=None)
def test_rle8_avi_roundtrip_is_lossless(n, h, w, maxval, seed):
    """decode(encode(frames)) reproduces palette[frames] exactly — for
    run-heavy content (small alphabets → long runs) AND noise (singleton
    runs → absolute-mode segments)."""
    rng = np.random.default_rng(seed)
    fr = rng.integers(0, maxval + 1, size=(n, h, w), dtype=np.uint8)
    pal = default_rle_palette()
    fps, dec = decode_avi(encode_avi_rle8(fr, pal, fps=10))
    assert fps == 10
    assert np.array_equal(dec, pal[fr])


@given(w=st.integers(min_value=256, max_value=600))
@settings(max_examples=10, deadline=None)
def test_rle8_long_runs_are_chopped_at_255(w):
    """A single-value row longer than 255 pixels must split into multiple
    encoded runs and still decode exactly."""
    row = np.full((1, w), 7, np.uint8)
    data = _rle8_encode_plane(row)
    assert np.array_equal(_rle8_decode_plane(data, 1, w), row)


def test_rle8_decoder_handles_delta_and_absolute_opcodes():
    """Hand-crafted stream: encoded run, DELTA skip (skipped pixels keep
    the zero-initialized canvas), word-padded absolute segment, EOL,
    second row, EOB — the full spec opcode set."""
    data = bytes(
        [3, 5]  # run: 3 × palette index 5
        + [0, 2, 2, 0]  # delta: skip 2 pixels right
        + [0, 3, 1, 2, 3, 0]  # absolute: literals 1,2,3 + word pad
        + [0, 0]  # end of line
        + [8, 7]  # next row: 8 × 7
        + [0, 1]  # end of bitmap
    )
    idx = _rle8_decode_plane(data, 2, 8)
    assert idx.tolist() == [[5, 5, 5, 0, 0, 1, 2, 3], [7, 7, 7, 7, 7, 7, 7, 7]]


def test_rle8_error_paths():
    pal = default_rle_palette()
    fr = np.zeros((1, 4, 4), np.uint8)
    with pytest.raises(ValueError, match="palette"):
        encode_avi_rle8(fr, np.zeros((16, 3), np.uint8))
    with pytest.raises(ValueError, match="past row end"):
        _rle8_decode_plane(bytes([9, 1, 0, 1]), 1, 8)  # run of 9 into width 8
    with pytest.raises(ValueError, match="end-of-bitmap"):
        _rle8_decode_plane(bytes([2, 1]), 1, 8)  # stream just stops
    with pytest.raises(ValueError, match="truncated"):
        _rle8_decode_plane(bytes([0, 2, 1]), 2, 8)  # delta missing dy
    # RLE8 AVI whose strf lost its palette: drop the 1024 palette bytes
    # and shrink every enclosing size field (strf, strl, hdrl, RIFF)
    payload = bytearray(encode_avi_rle8(fr, pal))
    import struct as _s

    pos = payload.index(b"strf")
    (ln,) = _s.unpack_from("<I", payload, pos + 4)
    dropped = ln - 40
    for tag_pos in [0, payload.index(b"hdrl") - 8, payload.index(b"strl") - 8]:
        (old,) = _s.unpack_from("<I", payload, tag_pos + 4)
        _s.pack_into("<I", payload, tag_pos + 4, old - dropped)
    _s.pack_into("<I", payload, pos + 4, 40)
    del payload[pos + 8 + 40 : pos + 8 + ln]
    with pytest.raises(ValueError, match="palette"):
        decode_avi(bytes(payload))


def test_rle8_mixed_runs_and_literals_roundtrip():
    """A row mixing long runs with literal stretches exercises both the
    encoded-run and absolute-mode emitters in one plane."""
    row = np.array([[9] * 10 + [1, 2, 3, 4, 5] + [6] * 3 + [7, 8] + [0] * 12], np.uint8)
    data = _rle8_encode_plane(row)
    assert np.array_equal(_rle8_decode_plane(data, 1, row.shape[1]), row)
    # absolute mode must actually appear for the 5-literal stretch
    assert bytes([0, 5, 1, 2, 3, 4, 5]) in data


# ---------------------------------------------------------------------------
# Motion-JPEG AVI (round 14)
# ---------------------------------------------------------------------------

from ibc_spark.ext.jpegcodec import (  # noqa: E402
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    jpeg_reference_decode,
)
from ibc_spark.ext.multimodal import encode_avi_mjpeg  # noqa: E402


@given(
    n=st.integers(min_value=0, max_value=4),
    mcus=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=40, deadline=None)
def test_mjpeg_avi_flat_mcu_exactness(n, mcus, seed):
    """With all-ones tables, MCU-flat MJPEG frames decode to exactly the
    pinned-order YCbCr round trip of the input — the container-level
    extension of the JPEG flat-MCU contract."""
    rng = np.random.default_rng(seed)
    colors = rng.integers(0, 256, size=(n, 1, mcus, 3), dtype=np.uint8)
    frames = np.repeat(np.repeat(colors, 16, axis=1), 16, axis=2)
    ones = [1] * 64
    fps, dec = decode_avi(encode_avi_mjpeg(frames, quant_luma=ones, quant_chroma=ones))
    assert fps == 10
    if n:
        y, cb, cr = _rgb_to_ycbcr(frames)
        exp = np.stack(_ycbcr_to_rgb(y, cb, cr), axis=-1)
        assert np.array_equal(dec, exp)
    else:
        assert dec.shape == (0, 16, mcus * 16, 3)


@given(seed=st.integers(min_value=0, max_value=2**31))
@settings(max_examples=15, deadline=None)
def test_mjpeg_avi_general_frames_match_reference(seed):
    """Arbitrary lossy frames: every '00dc' chunk decodes bit-identically
    to the scalar reference JPEG decoder."""
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(3, 16, 24, 3), dtype=np.uint8)
    payload = encode_avi_mjpeg(frames, quality=80)
    _fps, dec = decode_avi(payload)
    # pull each frame's JFIF stream back out of the movi list
    import struct as _s

    pos = payload.index(b"movi") + 4
    for i in range(3):
        cc = payload[pos : pos + 4]
        (ln,) = _s.unpack_from("<I", payload, pos + 4)
        assert cc == b"00dc"
        frame_jpeg = payload[pos + 8 : pos + 8 + ln]
        assert np.array_equal(dec[i], jpeg_reference_decode(frame_jpeg))
        pos += 8 + ln + (ln & 1)


def test_mjpeg_avi_dimension_cross_check():
    """An MJPEG frame whose JFIF dimensions disagree with avih errors."""
    frames = np.zeros((1, 16, 16, 3), np.uint8)
    payload = bytearray(encode_avi_mjpeg(frames))
    # shrink avih dimensions (w at offset avih+32, h at +36) AND strf to match
    pos = payload.index(b"avih") + 8
    import struct as _s

    _s.pack_into("<II", payload, pos + 32, 8, 8)
    spos = payload.index(b"strf") + 8
    _s.pack_into("<ii", payload, spos + 4, 8, 8)
    with pytest.raises(ValueError, match="dimensions"):
        decode_avi(bytes(payload))


def test_rle8_avi_accepts_small_biclrused_palette():
    """A conformant BI_RLE8 AVI with biClrUsed < 256 carries only
    clr_used*4 palette bytes; the decoder zero-pads to 256 entries like
    _decode_bmp's sibling path (ADVICE r14)."""
    import struct as _s

    pal = default_rle_palette()
    fr = np.random.default_rng(0).integers(0, 16, size=(2, 4, 8), dtype=np.uint8)
    payload = bytearray(encode_avi_rle8(fr, pal))
    want = decode_avi(bytes(payload))[1]

    # shrink the palette to the 16 used entries and set biClrUsed = 16
    pos = payload.index(b"strf")
    (ln,) = _s.unpack_from("<I", payload, pos + 4)
    dropped = (256 - 16) * 4
    for tag_pos in [0, payload.index(b"hdrl") - 8, payload.index(b"strl") - 8]:
        (old,) = _s.unpack_from("<I", payload, tag_pos + 4)
        _s.pack_into("<I", payload, tag_pos + 4, old - dropped)
    _s.pack_into("<I", payload, pos + 4, ln - dropped)
    _s.pack_into("<I", payload, pos + 8 + 32, 16)  # biClrUsed
    del payload[pos + 8 + 40 + 16 * 4 : pos + 8 + ln]
    fps, got = decode_avi(bytes(payload))
    assert np.array_equal(got, want)
