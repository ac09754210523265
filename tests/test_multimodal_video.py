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
