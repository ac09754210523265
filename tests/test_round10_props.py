"""Round-10 contracts: the gold-arm sample modulus must be inert (m == 1)
at every oracle corpus size, the queries-vs-corpus blocked-GEMM path must
agree with the full exact graph on the sampled src set, and the
NULL-safe attestation booleans must now produce the oracle's CONSTANT
VALUES on an empty corpus (ADVICE r9: the round-9 tests only asserted
no-crash)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def test_adaptive_sample_mod_oracle_sf_contract():
    """m == 1 at every oracle corpus size (500 embeddings at sf0.01 and
    sf0.001, 2000 at sf0.1), so driver-SF output and oracle SQL are
    unchanged by the round-10 gold-arm pricing."""
    from ibc_spark.ext.similarity import adaptive_sample_mod

    for n in (0, 1, 500, 2000, 2048):
        assert adaptive_sample_mod(n) == 1, n


@given(n=st.integers(min_value=0, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_adaptive_sample_mod_bounds(n):
    """m >= 1 always; past the inert regime the sample size n/m stays
    within [target, 2·target) — the audit slice never collapses and
    never grows past twice the target."""
    from ibc_spark.ext.similarity import adaptive_sample_mod

    m = adaptive_sample_mod(n)
    assert m >= 1
    if n > 2 * 2048:
        assert 2048 <= n / m < 2 * 2048


def test_adaptive_lsh_bits_floor_never_overrides_cap():
    """Regression for ADVICE r9: at tables >= 16 the packing cap
    63 // tables drops below the floor of 4; the floor must yield, so
    bits * tables < 64 holds for EVERY table count."""
    from ibc_spark.ext.similarity import adaptive_lsh_bits

    for tables in range(2, 64):
        for n in (1, 10**6, 10**12):
            b = adaptive_lsh_bits(n, tables=tables)
            assert b * tables < 64, (tables, n, b)


def test_knn_blocked_queries_path_agrees_with_full_graph(spark):
    """knn_graph_blocked(queries=sample) == the full exact graph filtered
    to src ∈ sample — the identity the round-10 gold-arm pricing rests
    on (each sampled node's exact top-k is computed against the FULL
    corpus, not within the sample)."""
    import numpy as np
    from pyspark.sql import functions as F

    from ibc_spark.ext.similarity import knn_graph_blocked

    rng = np.random.default_rng(11)
    rows = [(int(i), rng.normal(size=8).tolist()) for i in range(60)]
    e = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    full = {
        (r.src, r.rk): r.dst
        for r in knn_graph_blocked(
            e, id_col="vec_id", vec_col="embedding", k=3
        ).collect()
    }
    sample = e.where(F.col("vec_id") % 7 == 0)
    sliced = {
        (r.src, r.rk): r.dst
        for r in knn_graph_blocked(
            e, id_col="vec_id", vec_col="embedding", k=3, queries=sample
        ).collect()
    }
    expected = {k: v for k, v in full.items() if k[0] % 7 == 0}
    assert sliced == expected


@pytest.mark.parametrize(
    "name, truthy_cols",
    [
        ("ann_topk_lsh", ["recall_ok", "k_cap_ok"]),
        ("ann_topk_ivf", ["recall_ok", "k_cap_ok", "full_probe_matches_exact_ok"]),
        ("knn_graph_lsh", ["recall_ok", "no_self_edges_ok"]),
    ],
)
def test_attestation_booleans_vacuously_true_on_empty_corpus(
    spark, empty_sf, name, truthy_cols
):
    """With the r10 coalesce fix the attestation booleans equal the
    oracle's constant TRUE (not NULL) on a degenerate corpus, and the
    count columns equal 0 (not NULL) — value assertions, not no-crash."""
    from ibc_spark.registry import QUERIES

    [row] = QUERIES[name](spark, empty_sf).collect()
    d = row.asDict()
    for col in truthy_cols:
        assert d[col] is True, (name, col, d)
    for col, v in d.items():
        if col not in truthy_cols:
            assert v == 0, (name, col, d)


@pytest.mark.parametrize(
    "name", ["decontaminate_semantic", "preference_pairs_quality",
             "dedup_embedding_cosine", "histogram_equidepth_deciles",
             "dedup_canonical_priority"]
)
def test_round10_entries_tolerate_empty_corpus(spark, empty_sf, name):
    """The r10 additions and rewrites must survive a 0-row corpus (the
    first-run / fully-filtered case): no crash, 0 rows out (no groups,
    no pairs, no deciles)."""
    from ibc_spark.registry import QUERIES

    assert QUERIES[name](spark, empty_sf).collect() == []


def test_equidepth_tile_arithmetic_matches_ntile(spark):
    """The plan-time ntile arithmetic (small = n div 10, r = n mod 10,
    boundary split) must equal F.ntile(10) OVER the same total order for
    awkward n — including n < 10, n % 10 != 0, and exact multiples."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    for n in (1, 7, 10, 23, 100, 101, 109):
        df = spark.range(n).select(F.col("id").alias("k"))
        w = Window.orderBy("k")
        want = {
            r.k: r.t
            for r in df.withColumn("t", F.ntile(10).over(w)).collect()
        }
        small, rem = divmod(n, 10)
        boundary = rem * (small + 1)
        rank = F.row_number().over(w)
        tile = F.when(
            rank <= boundary, F.floor((rank + small) / (small + 1))
        ).otherwise(
            rem + F.floor((rank - boundary + max(small, 1) - 1) / max(small, 1))
        )
        got = {r.k: r.t for r in df.withColumn("t", tile.cast("int")).collect()}
        assert got == want, (n, got, want)


def test_preference_pairs_contract(spark):
    """Every emitted pair: chosen and rejected share the prompt group,
    chosen's logit is the group max (ties -> lowest doc_id), rejected's
    the group min (ties -> highest doc_id), margin > 0 and equal to the
    logit difference; zero-margin and singleton groups are absent."""
    from pyspark.sql import functions as F

    from ibc_spark.ext import text
    from ibc_spark.registry import QUERIES

    from .conftest import SF_ORACLE

    d = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id", text.quality_logit("text").alias("z"))
        .collect()
    )
    groups: dict[int, list] = {}
    for r in d:
        groups.setdefault(r.doc_id // 4, []).append((r.z, r.doc_id))
    rows = QUERIES["preference_pairs_quality"](spark, SF_ORACLE).collect()
    expected = {}
    for pid, members in groups.items():
        zs = [z for z, _ in members]
        if len(members) < 2 or max(zs) == min(zs):
            continue
        chosen = max(members, key=lambda p: (p[0], -p[1]))
        rejected = min(members, key=lambda p: (p[0], -p[1]))
        expected[pid] = (chosen[1], rejected[1], round(chosen[0] - rejected[0], 6))
    got = {r.prompt_id: (r.chosen_id, r.rejected_id, r.margin) for r in rows}
    assert got == expected
    assert all(m > 0 for _, _, m in got.values())


def test_decontaminate_semantic_planted_straddles(spark):
    """Contamination flags must be exactly the planted successor pairs
    that straddle the vec_id % 97 holdout boundary (the fixture has no
    natural pair at cosine >= 0.95), and every corpus id must appear."""
    from pyspark.sql import functions as F

    from ibc_spark.registry import QUERIES

    from .conftest import SF_ORACLE

    n = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").count()
    expected_hits = set()
    for i in range(0, n, 10):  # planted pair (i, i+1) when i % 10 == 0
        if i + 1 >= n:
            continue
        a_h, b_h = i % 97 == 0, (i + 1) % 97 == 0
        if a_h != b_h:
            expected_hits.add(i + 1 if a_h else i)
    rows = QUERIES["decontaminate_semantic"](spark, SF_ORACLE).collect()
    got_hits = {r.vec_id for r in rows if r.contaminated}
    assert got_hits == expected_hits, (got_hits, expected_hits)
    assert len(rows) == sum(1 for i in range(n) if i % 97 != 0)
    assert all((r.n_hits > 0) == r.contaminated for r in rows)
