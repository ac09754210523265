"""Property-based checks (SURVEY §5.3): the Spark Column implementations
must agree with an independent pure-Python reference on arbitrary inputs.

Each property batches all generated examples into ONE DataFrame so a
hypothesis example costs a row, not a Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ibc_spark.ext.dedup import jaccard, shingles
from ibc_spark.ext.text import tokens
from ibc_spark.io_.sinks import merge_upsert
from ibc_spark.ops import scalars

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# -- python references ------------------------------------------------------


def ref_parse_boolean(v: str | None) -> bool:
    if v is None:
        return False
    s = v.strip().lower()
    if s in ("yes", "true", "1"):
        return True
    return False  # 'no'/'false'/'0' and ALL junk → False (X1 truth table)


def ref_tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def ref_shingles(text: str, n: int = 3) -> list[str]:
    toks = ref_tokens(text)
    if not toks:
        return [""]
    m = max(len(toks) - n + 1, 1)
    out = []
    for i in range(m):
        s = " ".join(toks[i : i + n])
        if s not in out:
            out.append(s)
    return out


# -- properties -------------------------------------------------------------

boolish = st.one_of(
    st.none(),
    st.sampled_from(["yes", "no", "true", "false", "1", "0", "YES ", " No", "TrUe"]),
    st.text(max_size=8),
)


@SLOW
@given(st.lists(boolish, min_size=1, max_size=50))
def test_parse_boolean_matches_reference(spark, vals):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v string")
    got = {
        r["i"]: r["p"] for r in df.select("i", scalars.parse_boolean("v").alias("p")).collect()
    }
    assert got == {i: ref_parse_boolean(v) for i, v in enumerate(vals)}


texty = st.text(
    alphabet=st.sampled_from(list("abc xyz\t.!?")), min_size=0, max_size=60
)


@SLOW
@given(st.lists(texty, min_size=1, max_size=30))
def test_shingles_match_reference(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r["i"]: r["sh"]
        for r in df.select("i", shingles(tokens(F.col("t")), 3).alias("sh")).collect()
    }
    assert got == {i: ref_shingles(t) for i, t in enumerate(texts)}


@SLOW
@given(
    st.lists(st.booleans(), min_size=0, max_size=30),
)
def test_bits_to_string_roundtrip(spark, bits):
    df = spark.createDataFrame([(bits,)], "b array<boolean>")
    s = df.select(scalars.bits_to_string("b").alias("s")).first()["s"]
    assert s == "".join("1" if b else "0" for b in bits)


keyed_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-100, 100)), min_size=0, max_size=20
)


@SLOW
@given(old=keyed_rows, new=keyed_rows)
def test_merge_upsert_matches_dict_semantics(spark, old, new):
    # one row per key (merge's contract); dict-union gives the expected state
    old_d = {k: v for k, v in old}
    new_d = {k: v for k, v in new}
    old_df = spark.createDataFrame(
        [(k, v) for k, v in old_d.items()], "k long, v long"
    ) if old_d else spark.createDataFrame([], "k long, v long")
    new_df = spark.createDataFrame(
        [(k, v) for k, v in new_d.items()], "k long, v long"
    ) if new_d else spark.createDataFrame([], "k long, v long")
    got = {r["k"]: r["v"] for r in merge_upsert(old_df, new_df, key="k").collect()}
    assert got == {**old_d, **new_d}


@SLOW
@given(
    a=st.lists(st.text(alphabet="abcd", min_size=1, max_size=3), min_size=1, max_size=10),
    b=st.lists(st.text(alphabet="abcd", min_size=1, max_size=3), min_size=1, max_size=10),
)
def test_jaccard_matches_reference(spark, a, b):
    sa, sb = list(dict.fromkeys(a)), list(dict.fromkeys(b))
    df = spark.createDataFrame([(sa, sb)], "a array<string>, b array<string>")
    got = df.select(jaccard(F.col("a"), F.col("b")).alias("j")).first()["j"]
    expected = len(set(sa) & set(sb)) / len(set(sa) | set(sb))
    assert abs(got - expected) < 1e-12


@given(
    h=st.integers(min_value=1, max_value=9),
    w=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(deadline=None, max_examples=60)
def test_ppm_codec_round_trip_property(h, w, seed):
    """PPM encode->decode is the identity for every image shape (pure
    numpy, no Spark)."""
    import numpy as np

    from ibc_spark.ext.multimodal import decode_image, encode_ppm

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(img)) == img).all()


@given(
    parts=st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters="\x00", codec="utf-8"),
            max_size=20,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(deadline=None, max_examples=60)
def test_pgwire_literal_quoting_property(parts):
    """_literal's string quoting: for ANY NUL-free text, the rendered
    literal is a single balanced SQL string (quote-doubled), and
    un-doubling recovers the original."""
    from ibc_spark.io_.pgwire import _literal

    for s in parts:
        lit = _literal(s)
        assert lit.startswith("'") and lit.endswith("'")
        inner = lit[1:-1]
        # every original quote is doubled; nothing else altered
        assert inner.replace("''", "'") == s
        # no unescaped single quote remains (scan ignoring doubled pairs)
        i, bad = 0, False
        while i < len(inner):
            if inner[i] == "'":
                if i + 1 < len(inner) and inner[i + 1] == "'":
                    i += 2
                    continue
                bad = True
                break
            i += 1
        assert not bad, lit


@given(
    st.lists(
        st.floats(
            min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=400,
    )
)
@SLOW
def test_two_level_fold_property(spark, vals):
    """For ARBITRARY float lists the bounded two-level tree fold must be
    bit-identical to its pure-Python specification: left-fold within
    width-_FOLD_B id buckets in id order, then left-fold bucket partials
    in bucket order. (A crafted-magnitude case lives in test_lakehouse;
    this widens it to arbitrary inputs.)"""
    from ibc_spark.ext.foldspec import _FOLD_B, _fold_bkt, _ordered_fold

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "vec_id long, x double"
    )
    got = (
        df.groupBy(_fold_bkt())
        .agg(_ordered_fold(F.col("vec_id"), F.col("x")).alias("psum"))
        .groupBy()
        .agg(_ordered_fold(F.col("bkt"), F.col("psum")).alias("t"))
        .collect()[0]["t"]
    )
    expect = 0.0
    for b in range(0, len(vals), _FOLD_B):
        acc = 0.0
        for v in vals[b : b + _FOLD_B]:
            acc += v
        expect += acc
    assert got == expect or (got != got and expect != expect)
