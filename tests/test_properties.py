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


# -- round-8 operator properties --------------------------------------------

doc_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]),
    min_size=2,
    max_size=25,
)


def ref_containment(a: str, b: str, n: int = 2) -> float:
    sa, sb = set(ref_shingles(a, n)), set(ref_shingles(b, n))
    return len(sa & sb) / len(sa) if sa else 0.0


@SLOW
@given(st.lists(doc_words, min_size=2, max_size=6))
def test_containment_pairs_match_reference(spark, docs_words):
    """ngram_containment_pairs == the set-arithmetic reference on random
    small corpora, for EVERY emitted direction; and containment ≥ jaccard
    for the same ordered pair (|A∩B|/|A| ≥ |A∩B|/|A∪B|)."""
    from ibc_spark.ext.dedup import ngram_containment_pairs

    texts = [" ".join(w) for w in docs_words]
    df = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)], ["doc_id", "text", "source"]
    )
    got = {
        (r["inner_id"], r["outer_id"]): r["containment"]
        for r in ngram_containment_pairs(
            df, id_col="doc_id", text_col="text", block_col="source",
            n=2, threshold=0.3,
        ).collect()
    }
    for i, a in enumerate(texts):
        for j, b in enumerate(texts):
            if i == j:
                continue
            want = ref_containment(a, b)
            if want >= 0.3:
                assert (i, j) in got and abs(got[(i, j)] - want) < 1e-9
            else:
                assert (i, j) not in got
    for (i, j), c in got.items():
        sa = set(ref_shingles(texts[i], 2))
        sb = set(ref_shingles(texts[j], 2))
        jac = len(sa & sb) / len(sa | sb)
        assert c >= jac - 1e-12


@SLOW
@given(st.lists(doc_words, min_size=1, max_size=5), st.integers(3, 6))
def test_duplicate_spans_reference(spark, docs_words, window):
    """duplicate_spans == a direct python sweep: spans are exactly the
    merged ranges of duplicated stride-1 windows, never overlap within a
    doc, and always fit inside the doc's token range."""
    from ibc_spark.ext.dedup import duplicate_spans

    texts = [" ".join(w) for w in docs_words]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = duplicate_spans(
        df, id_col="doc_id", text_col="text", window=window
    ).collect()

    # python reference
    from collections import Counter

    occs = []  # (doc, start(1-based), passage)
    for d, t in enumerate(texts):
        toks = t.lower().split()
        for i in range(len(toks) - window + 1):
            occs.append((d, i + 1, " ".join(toks[i : i + window])))
    counts = Counter(p for _, _, p in occs)
    dup_starts: dict[int, list[int]] = {}
    for d, s, p in occs:
        if counts[p] > 1:
            dup_starts.setdefault(d, []).append(s)
    want = {}
    for d, starts in dup_starts.items():
        spans = []
        for s in sorted(starts):
            e = s + window - 1
            if spans and s <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e), spans[-1][2] + 1)
            else:
                spans.append((s, e, 1))
        want[d] = [(a, b) for a, b, _ in spans]
    got: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
        ntoks = len(texts[r["doc_id"]].split())
        assert 1 <= r["span_start"] <= r["span_end"] <= ntoks
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1
    for d in got:
        got[d].sort()
    assert got == want


@SLOW
@given(st.lists(st.integers(0, 400), min_size=1, max_size=60),
       st.integers(2, 4))
def test_kmv_merge_associative_reference(spark, ids, n_parts):
    """The KMV k-min merge is associative and split-insensitive: merging
    per-part k-min sets over ANY partition of the ids equals the global
    k-min (the invariant sketch_kmv_rollup_merge's oracle attests on real
    data, here over adversarial splits)."""
    import hashlib

    k = 8
    hs = sorted(
        {int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) for i in ids}
    )
    global_kmin = hs[:k]
    parts: list[list[int]] = [[] for _ in range(n_parts)]
    for idx, i in enumerate(sorted(set(ids))):
        parts[idx % n_parts].append(i)
    merged = sorted(
        {
            h
            for p in parts
            for h in sorted(
                int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) for i in p
            )[:k]
        }
    )[:k]
    assert merged == global_kmin


@SLOW
@given(st.lists(doc_words, min_size=1, max_size=5), st.integers(3, 6))
def test_spans_rewrite_reference(spark, docs_words, window):
    """spans_rewrite == a direct python apply: per doc, cut tokens are
    exactly those covered by merged non-canonical duplicated windows
    (canonical = min (doc, start) corpus-wide); cleaned text is the
    surviving tokens in order; n = cut + kept always."""
    from ibc_spark.ext.dedup import spans_rewrite
    from ibc_spark.ext.persistreg import release_persisted

    texts = [" ".join(w) for w in docs_words]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = {
        r["doc_id"]: r
        for r in spans_rewrite(
            df, id_col="doc_id", text_col="text", window=window
        ).collect()
    }
    release_persisted()

    # python reference
    occs: dict[str, list[tuple[int, int]]] = {}
    for d, t in enumerate(texts):
        toks = t.lower().split()
        for i in range(len(toks) - window + 1):
            occs.setdefault(" ".join(toks[i : i + window]), []).append((d, i + 1))
    cut_positions: dict[int, set[int]] = {}
    for occ_list in occs.values():
        if len(occ_list) > 1:
            for d, s in sorted(occ_list)[1:]:  # all but the canonical
                cut_positions.setdefault(d, set()).update(range(s, s + window))
    for d, t in enumerate(texts):
        toks = t.split()
        cut = cut_positions.get(d, set())
        want_clean = " ".join(
            tok for i, tok in enumerate(toks, start=1) if i not in cut
        )
        r = rows[d]
        assert r["n_tokens"] == len(toks)
        assert r["cut_tokens"] == len(cut)
        assert r["kept_tokens"] == len(toks) - len(cut)
        assert r["cleaned_text"] == want_clean


@SLOW
@given(
    st.lists(st.tuples(doc_words, st.sampled_from(["s0", "s1"])), min_size=1, max_size=6),
    st.integers(2, 4),
)
def test_boilerplate_passages_reference(spark, docs, n):
    """boilerplate_passages == the brute-force per-source document-frequency
    count on random corpora; 0 <= n_boilerplate <= n_passages always."""
    from ibc_spark.ext.dedup import boilerplate_passages
    from ibc_spark.ext.persistreg import release_persisted

    rows_in = [(i, " ".join(w), src) for i, (w, src) in enumerate(docs)]
    df = spark.createDataFrame(rows_in, ["doc_id", "text", "source"])
    got = {
        r["doc_id"]: r
        for r in boilerplate_passages(
            df, id_col="doc_id", text_col="text", group_col="source",
            n=n, min_docs=2,
        ).collect()
    }
    release_persisted()

    def grams(t: str) -> set[str]:
        toks = t.lower().split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    by_src: dict[str, dict[str, int]] = {}
    for i, t, src in rows_in:
        for g in grams(t):
            by_src.setdefault(src, {}).setdefault(g, 0)
        # document frequency: count distinct docs containing g
    for i, t, src in rows_in:
        for g in grams(t):
            by_src[src][g] += 1
    for i, t, src in rows_in:
        gs = grams(t)
        want_boiler = sum(1 for g in gs if by_src[src][g] >= 2)
        r = got[i]
        assert r["n_passages"] == len(gs)
        assert r["n_boilerplate"] == want_boiler
        assert 0 <= r["n_boilerplate"] <= r["n_passages"]
