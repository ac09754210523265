"""Unit tests for the lakehouse-maintenance / layout / graph entries
(``ibc_spark.registry_lakehouse`` + ``ibc_spark.ext.layout``): semantic
invariants the oracle hash can't express — Morton bit interleaving,
file-granularity compaction, skyline dominance, PageRank mass
conservation, k-means partition totals.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ibc_spark.ext import layout
from tests.conftest import SF_ORACLE


def _py_morton(x: int, y: int, bits: int = 4) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


def test_morton_key_matches_reference_bit_interleave(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "qx int, qy int")
    got = {
        (r.qx, r.qy): r.z
        for r in df.select(
            "qx", "qy", layout.morton_key(F.col("qx"), F.col("qy"), 4).alias("z")
        ).collect()
    }
    assert all(got[(x, y)] == _py_morton(x, y) for x, y in rows)
    # bijective on the 16x16 grid — no two cells share a key
    assert len(set(got.values())) == 256


def test_zorder_buckets_are_rectangles(spark):
    """Each top-level z bucket spans at most half the quantized range on
    either dimension — the locality property pruning depends on."""
    from ibc_spark.registry import QUERIES

    out = QUERIES["zorder_layout_events"](spark, SF_ORACLE).collect()
    assert sum(r.n_events for r in out) == 10_000
    for r in out:
        assert r.max_qu - r.min_qu <= 8
        assert r.max_qv - r.min_qv <= 8


def test_bin_pack_file_granularity(spark, tmp_path):
    """The input_file_name()-keyed twin of compaction_bin_packing: plan
    bins over a deliberately fragmented parquet write."""
    src = str(tmp_path / "frag")
    spark.range(0, 10_000).withColumn("v", F.col("id") % 7).repartition(16).write.parquet(src)
    df = spark.read.parquet(src)
    units = (
        df.groupBy(F.regexp_extract(F.input_file_name(), "[^/]+$", 0).alias("file"))
        .agg(F.count("*").alias("n_rows"))
    )
    assert units.count() == 16
    packed = layout.bin_pack_by_size(units, order_col="file", size_col="n_rows", target=2_000)
    plan = packed.collect()
    # every file assigned exactly one bin; totals preserved
    assert sum(r.n_rows for r in plan) == 10_000
    by_bin: dict[int, int] = {}
    for r in plan:
        by_bin[r.bin] = by_bin.get(r.bin, 0) + r.n_rows
    # greedy prefix packing: every bin except possibly the last crosses the
    # target only via its final unit, so no bin exceeds target + max(unit)
    max_unit = max(r.n_rows for r in plan)
    assert all(v <= 2_000 + max_unit for v in by_bin.values())
    # bins are contiguous 0..n
    assert sorted(by_bin) == list(range(len(by_bin)))


def test_skyline_is_exact_pareto_frontier(spark):
    """Brute-force dominance check at sf0.001 (~1.5k orders)."""
    from ibc_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    pts = [
        (r.o_orderkey, r.o_orderdate, r.o_totalprice)
        for r in spark.read.parquet(f"{sf}/orders.parquet")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .collect()
    ]
    got = {r.o_orderkey for r in QUERIES["skyline_orders_2d"](spark, sf).collect()}

    def dominated(p) -> bool:
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2]) for q in pts
        )

    want = {k for (k, d, v) in pts if not dominated((k, d, v))}
    assert got == want


def test_pagerank_conserves_mass(spark):
    from ibc_spark.registry import QUERIES

    ranks = QUERIES["graph_pagerank_trade"](spark, SF_ORACLE).collect()
    assert len(ranks) == 25
    total = sum(r.rank for r in ranks)
    assert abs(total - 1.0) < 1e-6
    assert all(r.rank > 0 for r in ranks)


def test_kmeans_covers_all_vectors(spark):
    from ibc_spark.registry import QUERIES

    out = QUERIES["kmeans_embeddings_2iter"](spark, SF_ORACLE).collect()
    assert sum(r.n_members for r in out) == 500
    assert all(r.inertia >= 0 for r in out)
    assert 1 <= len(out) <= 4


def test_no_unbounded_rowscale_collects(spark):
    """Contract for the round-6 scale flag (VERDICT r6 #1): every
    collect_list that gathers ROW-KEYED structs (struct(k=vec_id, ...) —
    the deterministic-fold input whose group size tracks corpus size) must
    be grouped by the width-_FOLD_B vec_id bucket, so no aggregation
    buffer ever holds a whole corpus-scale group. Level-2 folds (bucket
    partials) and O(dim) folds (pos-keyed) are exempt by construction."""
    import re

    from ibc_spark.registry import QUERIES
    from ibc_spark.registry_lakehouse import _FOLD_B

    for name in (
        "kmeans_embeddings_2iter",
        "embedding_power_iteration_pc1",
        "dedup_semdedup",
        "embedding_pq_trained",
        "graph_pagerank_shuffled",
    ):
        plan = QUERIES[name](spark, SF_ORACLE)._jdf.queryExecution().analyzed().toString()
        rowkeyed = re.compile(r"collect_list\(struct\(k, (vec_id|src|node)#")
        for line in plan.splitlines():
            if not rowkeyed.search(line):
                continue
            m = re.search(r"Aggregate \[([^\]]*)\]", line)
            assert m, f"{name}: collect_list outside an Aggregate node:\n{line[:200]}"
            grouping = m.group(1)
            # the bucket key appears either inline (groupBy(expr)) or as a
            # pre-projected attribute named bkt (groupBy("dst", "bkt"))
            assert (
                f"div cast({_FOLD_B} as bigint)" in grouping
                or re.search(r"\bbkt#\d+", grouping)
            ), f"{name}: row-scale collect_list not bucket-grouped:\n{line[:200]}"


def test_km_level1_groups_are_bucket_bounded(spark):
    """The level-1 fold's aggregation groups hold at most _FOLD_B structs —
    checked by replaying km_train's level-1 grouping on a 1000-vector frame
    (multiple buckets per cluster) and measuring the max group size."""
    from pyspark.sql import functions as F

    from ibc_spark.registry_lakehouse import _FOLD_B, _fold_bkt, km_assign, km_train

    emb = spark.range(1000).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"), (F.col("id") % 3).cast("double")
        ).alias("v"),
    )
    a1 = km_assign(emb, km_train(emb, k=2))
    sizes = (
        a1.select("vec_id", "cid", F.posexplode("v").alias("pos0", "val"))
        .groupBy("cid", (F.col("pos0") + 1).alias("pos"), _fold_bkt())
        .count()
    )
    assert sizes.agg(F.max("count")).collect()[0][0] <= _FOLD_B


def test_two_level_fold_matches_python_replay_bitwise(spark):
    """The bounded two-level fold must produce EXACTLY the bits of its
    specification (fold in key order within width-_FOLD_B buckets, then
    fold bucket partials in bucket order) — replayed in plain Python
    floats over a value set chosen to make summation order matter
    (alternating magnitudes), across a bucket boundary."""
    from pyspark.sql import functions as F

    from ibc_spark.registry_lakehouse import _FOLD_B, _fold_bkt, _ordered_fold

    n = 3 * _FOLD_B + 17
    vals = [((-1.0) ** i) * (1e10 if i % 5 == 0 else 1e-7) * (i + 1) for i in range(n)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "vec_id long, x double"
    )
    got = (
        df.groupBy(_fold_bkt())
        .agg(_ordered_fold(F.col("vec_id"), F.col("x")).alias("psum"))
        .groupBy()
        .agg(_ordered_fold(F.col("bkt"), F.col("psum")).alias("total"))
        .collect()[0]["total"]
    )
    partials = []
    for b in range(0, n, _FOLD_B):
        acc = 0.0
        for v in vals[b : b + _FOLD_B]:
            acc += v
        partials.append(acc)
    expect = 0.0
    for p in partials:
        expect += p
    assert got == expect  # bit-for-bit, not approx


def test_two_level_fold_is_partitioning_invariant(spark):
    """The fold's result must not depend on HOW the input is distributed —
    the property that makes the bit-exact oracle claim valid on a real
    cluster, where partition counts and row placement differ from
    local[32]. Same data through 1, 13, and 64 partitions must produce
    identical bits."""
    from pyspark.sql import functions as F

    from ibc_spark.registry_lakehouse import _fold_bkt, _ordered_fold

    n = 1000
    vals = [((-1.0) ** i) * (1e9 if i % 7 == 0 else 1e-6) * (i + 1) for i in range(n)]
    base = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "vec_id long, x double"
    )

    def total(df):
        return (
            df.groupBy(_fold_bkt())
            .agg(_ordered_fold(F.col("vec_id"), F.col("x")).alias("psum"))
            .groupBy()
            .agg(_ordered_fold(F.col("bkt"), F.col("psum")).alias("t"))
            .collect()[0]["t"]
        )

    t1 = total(base.coalesce(1))
    t13 = total(base.repartition(13))
    t64 = total(base.repartition(64, "x"))
    assert t1 == t13 == t64


def test_gopher_rules_pure_projection_plan(spark):
    """The quality gate must stay a shuffle-free codegen projection."""
    from ibc_spark.registry import QUERIES

    plan = QUERIES["text_gopher_rules"](spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_triangle_count_invariants(spark):
    from ibc_spark.registry import QUERIES

    r = QUERIES["graph_triangle_count"](spark, SF_ORACLE).collect()[0]
    assert r.n_nodes <= 25
    assert r.n_edges <= r.n_nodes * (r.n_nodes - 1) // 2
    # every triangle closes three wedges
    assert 0 <= 3 * r.n_triangles <= r.n_wedges
    assert 0.0 <= r.global_clustering <= 1.0


def test_power_iteration_unit_norm_and_dominance(spark):
    import math

    from ibc_spark.registry import QUERIES

    rows = QUERIES["embedding_power_iteration_pc1"](spark, SF_ORACLE).collect()
    assert len(rows) == 64
    nrm = math.sqrt(sum(r.loading**2 for r in rows))
    assert abs(nrm - 1.0) < 1e-6
    # sigma_sq is the same scalar on every row and positive
    assert len({r.sigma_sq for r in rows}) == 1
    assert rows[0].sigma_sq > 0


def test_power_iteration_empty_corpus_parity(spark, duck, empty_sf):
    """An empty embeddings table yields the oracle's 64 (pos, NULL, NULL)
    rows — not the 0/sqrt(0) NaN loadings and 0.0 sigma the bare
    normalization arithmetic would produce (ADVICE r12 #1: the silent
    empty-corpus parity drift)."""
    import os

    import duckdb

    from ibc_spark.registry import ORACLES, QUERIES
    from tests.parity import assert_parity

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"create view {t} as select * from "
            f"read_parquet('{os.path.join(empty_sf, t)}.parquet/*.parquet')"
        )
    name = "embedding_power_iteration_pc1"
    df = QUERIES[name](spark, empty_sf)
    rows = df.collect()
    assert len(rows) == 64
    assert all(r.loading is None and r.sigma_sq is None for r in rows)
    assert_parity(name, df, con, ORACLES[name])


def test_bfs_distances_are_minimal(spark):
    """BFS dist must equal the true min-hop distance (checked by a driver
    Floyd-style closure over the tiny distilled nation graph)."""
    from pyspark.sql import functions as F

    from ibc_spark.io_.sources import read_table
    from ibc_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    li, o = read_table(spark, sf, "lineitem"), read_table(spark, sf, "orders")
    cu, su = read_table(spark, sf, "customer"), read_table(spark, sf, "supplier")
    edges = {
        (r.src, r.dst)
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .select(cu.c_nationkey.alias("src"), su.s_nationkey.alias("dst"))
        .where("src <> dst")
        .distinct()
        .collect()
    }
    dist = {0: 0}
    frontier = {0}
    for hop in (1, 2, 3):
        frontier = {d for (s, d) in edges if s in frontier} - set(dist)
        dist.update({n: hop for n in frontier})
    got = {r.node: r.dist for r in QUERIES["graph_khop_reachability"](spark, sf).collect()}
    assert got == dist


def test_scan_pruning_stats_skippable_consistent(spark):
    from ibc_spark.registry import QUERIES

    rows = QUERIES["scan_pruning_stats"](spark, SF_ORACLE).collect()
    assert sum(r.n_rows for r in rows) == 10_000
    for r in rows:
        assert r.min_v <= r.max_v
        assert r.skippable == (r.max_v < 450.0)


def test_diverse_sample_picks_most_central(spark):
    """Prototype selection on a planted two-cluster frame: the per-cluster
    top-k by centroid distance must be exactly the points nearest each
    cluster's true center, ranks contiguous, distances monotone."""
    from pyspark.sql import functions as F

    from ibc_spark.registry import QUERIES  # noqa: F401  (import parity)
    from ibc_spark.registry_lakehouse import km_assign_2iter

    # two tight blobs on a 2-d line, ids interleaved so init picks one of each
    pts = []
    for i in range(40):
        center = 0.0 if i % 2 == 0 else 100.0
        pts.append((i, [center + (i % 7) * 0.5, center - (i % 5) * 0.25]))
    emb = spark.createDataFrame(pts, ["vec_id", "v"]).select(
        "vec_id", F.transform("v", lambda x: x.cast("double")).alias("v")
    )
    from pyspark.sql import Window

    a2 = km_assign_2iter(emb, k=2)
    w = Window.partitionBy("cid").orderBy("dist", "vec_id")
    top = (
        a2.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .collect()
    )
    by_cid = {}
    for r in top:
        by_cid.setdefault(r["cid"], []).append(r)
    assert len(by_cid) == 2
    full = a2.collect()
    for cid, rows in by_cid.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        dists = [r["dist"] for r in rows]
        assert dists == sorted(dists)
        # every selected distance <= every unselected distance in the cluster
        chosen = {r["vec_id"] for r in rows}
        rest = [r["dist"] for r in full if r["cid"] == cid and r["vec_id"] not in chosen]
        if rest:
            assert max(dists) <= min(rest)
