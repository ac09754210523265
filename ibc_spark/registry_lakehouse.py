"""Lakehouse-maintenance + graph/layout analytics registry entries
(round 7): Z-order layout keys, compaction bin-packing, the full
Gopher-style document-quality rule suite, a 2-D skyline (Pareto frontier),
iterative weighted PageRank, and fixed-iteration k-means.

Cross-engine determinism follows the repo rules (``ibc_spark.registry``):
integer math wherever possible; every floating-point GROUP sum is a LEFT
FOLD over a list sorted by a key so Spark and DuckDB add in the same
order; single divisions/products of identical operands are IEEE-identical
and need no rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibc_spark.ext import layout
from ibc_spark.io_.sources import read_table
from ibc_spark.registry import query

# ---------------------------------------------------------------------------
# Z-order layout (data clustering for multi-dimensional pruning)
# ---------------------------------------------------------------------------


@query(
    "zorder_layout_events",
    oracle=f"""
    WITH b AS (
      SELECT min(user_id) AS min_u, max(user_id) AS max_u,
             min(value)   AS min_v, max(value)   AS max_v
      FROM events
    ),
    q AS (
      SELECT least(15, CAST(floor((CAST(user_id AS DOUBLE) - min_u) * 16.0 / (max_u - min_u)) AS INTEGER)) AS qu,
             least(15, CAST(floor((CAST(value AS DOUBLE) - min_v) * 16.0 / (max_v - min_v)) AS INTEGER)) AS qv
      FROM events, b
    ),
    z AS (SELECT qu, qv, {layout.morton_sql("qu", "qv", 4)} AS z_key FROM q)
    SELECT z_key >> 4 AS bucket,
           count(*) AS n_events,
           count(DISTINCT z_key) AS n_cells,
           min(qu) AS min_qu, max(qu) AS max_qu,
           min(qv) AS min_qv, max(qv) AS max_qv
    FROM z
    GROUP BY 1
    """,
)
def zorder_layout_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, value), summarized per
    top-level bucket: each bucket is a RECTANGLE in quantized space
    (min/max qu/qv spans ≤ 8), which is exactly why a
    ``repartitionByRange(z_key)`` write lets parquet min/max footers prune
    on either dimension. The layout job at 100 TB is: this projection
    (codegen, zero shuffle) + one range-partitioned write; quantization
    bounds come from one tiny agg broadcast to every task.

    Assumes both dims are non-constant (span > 0) — a constant dim should
    simply be dropped from the key.
    """
    ev = read_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min("user_id").alias("min_u"),
        F.max("user_id").alias("max_u"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    q = ev.crossJoin(F.broadcast(b)).select(
        layout.quantize_minmax("user_id", F.col("min_u"), F.col("max_u"), 16).alias("qu"),
        layout.quantize_minmax("value", F.col("min_v"), F.col("max_v"), 16).alias("qv"),
    )
    z = q.select("qu", "qv", layout.morton_key(F.col("qu"), F.col("qv"), 4).alias("z_key"))
    return z.groupBy(F.shiftright("z_key", 4).alias("bucket")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("z_key").alias("n_cells"),
        F.min("qu").alias("min_qu"),
        F.max("qu").alias("max_qu"),
        F.min("qv").alias("min_qv"),
        F.max("qv").alias("max_qv"),
    )


# ---------------------------------------------------------------------------
# Compaction bin-packing (small-file / small-partition maintenance planning)
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 3000  # rows per output bin at the test scale


@query(
    "compaction_bin_packing",
    oracle=f"""
    WITH u AS (SELECT event_type, count(*) AS n_rows FROM events GROUP BY 1),
    p AS (
      SELECT event_type, n_rows,
             CAST(sum(n_rows) OVER (ORDER BY event_type
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
      FROM u
    )
    SELECT CAST(floor((run - n_rows) / {_COMPACT_TARGET}.0) AS BIGINT) AS bin,
           count(*) AS n_units,
           CAST(sum(n_rows) AS BIGINT) AS bin_rows,
           min(event_type) AS first_unit,
           max(event_type) AS last_unit
    FROM p
    GROUP BY 1
    """,
)
def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-partition compaction planning: per-partition row counts →
    greedy prefix-sum packing into ~target-row output bins
    (:func:`ibc_spark.ext.layout.bin_pack_by_size`). The window runs over
    UNITS (one row per partition/file — thousands at 100 TB, not billions),
    so the single-partition sort in the plan is deliberate and safe; the
    heavy work stays in the rewrite, which is partition-local. The
    file-granularity twin (``input_file_name()``-keyed) is exercised in
    ``tests/test_extensions.py`` against a multi-file parquet write.
    """
    ev = read_table(spark, sf_dir, "events")
    units = ev.groupBy("event_type").agg(F.count("*").alias("n_rows"))
    packed = layout.bin_pack_by_size(
        units, order_col="event_type", size_col="n_rows", target=_COMPACT_TARGET
    )
    return packed.groupBy("bin").agg(
        F.count("*").alias("n_units"),
        F.sum("n_rows").alias("bin_rows"),
        F.min("event_type").alias("first_unit"),
        F.max("event_type").alias("last_unit"),
    )


# ---------------------------------------------------------------------------
# Gopher-style document-quality rule suite
# ---------------------------------------------------------------------------

_STOPS = "['the','of','and','to','in','is','a']"


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks,
             string_split(text, chr(10)) AS lines
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(toks, w -> length(w))), (a,x) -> a + x) AS DOUBLE)
                 / greatest(len(toks), 1) AS mean_word_len,
             CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
                 / greatest(len(toks), 1) AS alpha_ratio,
             (CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
              + (length(text) - length(replace(text, '...', ''))) / 3)
                 / greatest(len(toks), 1) AS symbol_ratio,
             CAST(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
                 / greatest(len(lines), 1) AS bullet_ratio,
             CAST(len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.\\s*$'))) AS DOUBLE)
                 / greatest(len(lines), 1) AS ellipsis_ratio,
             len(list_filter(toks, w -> list_contains({_STOPS}, w))) AS stop_hits
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, alpha_ratio, symbol_ratio,
           bullet_ratio, ellipsis_ratio, stop_hits,
           (n_words BETWEEN 10 AND 100000) AS pass_words,
           (mean_word_len BETWEEN 2.0 AND 12.0) AS pass_word_len,
           (symbol_ratio < 0.1) AS pass_symbols,
           (bullet_ratio <= 0.9) AS pass_bullets,
           (ellipsis_ratio <= 0.3) AS pass_ellipsis,
           (alpha_ratio > 0.6) AS pass_alpha,
           (stop_hits >= 2) AS pass_stopwords,
           ((n_words BETWEEN 10 AND 100000) AND (mean_word_len BETWEEN 2.0 AND 12.0)
            AND (symbol_ratio < 0.1) AND (bullet_ratio <= 0.9)
            AND (ellipsis_ratio <= 0.3) AND (alpha_ratio > 0.6)
            AND (stop_hits >= 2)) AS keep
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Gopher-style repetition-free quality gate (Rae et al. 2021,
    §A1.1 shape): word-count bounds, mean-word-length bounds,
    symbol-to-word ratio (# and ellipses), bullet-line and ellipsis-line
    ratios, alphabetic-word ratio, stopword presence — per-doc flags plus
    the conjunctive ``keep``. Pure codegen projection (higher-order
    ``filter``/``aggregate`` on split arrays, zero shuffle, zero Python) —
    the shape you want in front of a 100 TB pretraining scan. Ratios are
    single divisions of identical operands on both engines, so doubles
    match bit-for-bit without rounding.
    """
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "text",
        F.expr("filter(split(lower(text), '\\\\s+'), x -> x != '')").alias("toks"),
        F.split("text", "\n").alias("lines"),
    )
    m = t.select(
        "doc_id",
        F.size("toks").alias("n_words"),
        F.expr(
            "CAST(aggregate(toks, CAST(0 AS BIGINT), (a, w) -> a + length(w)) AS DOUBLE)"
            " / greatest(size(toks), 1)"
        ).alias("mean_word_len"),
        F.expr(
            "CAST(size(filter(toks, w -> w rlike '[a-z]')) AS DOUBLE) / greatest(size(toks), 1)"
        ).alias("alpha_ratio"),
        F.expr(
            "(CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)"
            " + (length(text) - length(replace(text, '...', ''))) / 3)"
            " / greatest(size(toks), 1)"
        ).alias("symbol_ratio"),
        F.expr(
            "CAST(size(filter(lines, l -> l rlike '^\\\\s*[-*•]')) AS DOUBLE)"
            " / greatest(size(lines), 1)"
        ).alias("bullet_ratio"),
        F.expr(
            "CAST(size(filter(lines, l -> l rlike '\\\\.\\\\.\\\\.\\\\s*$')) AS DOUBLE)"
            " / greatest(size(lines), 1)"
        ).alias("ellipsis_ratio"),
        F.expr(f"size(filter(toks, w -> array_contains(array({_STOPS[1:-1]}), w)))")
        .cast("bigint")
        .alias("stop_hits"),
    )
    flags = {
        "pass_words": F.col("n_words").between(10, 100000),
        "pass_word_len": F.col("mean_word_len").between(2.0, 12.0),
        "pass_symbols": F.col("symbol_ratio") < 0.1,
        "pass_bullets": F.col("bullet_ratio") <= 0.9,
        "pass_ellipsis": F.col("ellipsis_ratio") <= 0.3,
        "pass_alpha": F.col("alpha_ratio") > 0.6,
        "pass_stopwords": F.col("stop_hits") >= 2,
    }
    out = m.select("*", *[v.alias(k) for k, v in flags.items()])
    keep = None
    for k in flags:
        keep = F.col(k) if keep is None else (keep & F.col(k))
    return out.withColumn("keep", keep)


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier): earliest, highest-value orders
# ---------------------------------------------------------------------------


@query(
    "skyline_orders_2d",
    oracle="""
    WITH d AS (
      SELECT o_orderkey, o_orderdate, o_totalprice,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dday
      FROM orders
    ),
    w AS (
      SELECT o_orderkey, o_orderdate, o_totalprice, dday,
             max(o_totalprice) OVER (ORDER BY dday
                 RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx_prev,
             max(o_totalprice) OVER (PARTITION BY dday) AS mx_same
      FROM d
    )
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM w
    WHERE (mx_prev IS NULL OR o_totalprice > mx_prev)
      AND o_totalprice = mx_same
    """,
)
def skyline_orders_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier: orders not dominated on (earlier date,
    higher total price). Two-phase distributed plan: phase 1 computes the
    LOCAL skyline inside each month partition (dominated-in-month ⇒
    dominated-globally, so dropping is lossless and the survivor set is
    tiny — O(distinct dates) per month); phase 2 runs the exact global
    window over survivors only. The single-partition global sort therefore
    touches ~|skyline candidates| rows, not the table — the shape that
    survives 100 TB. Oracle is the direct single-window formulation; both
    return the identical frontier.
    """
    o = read_table(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias("dday"),
    )

    def skyline_pass(df: DataFrame, *part: str) -> DataFrame:
        w_prev = (
            Window.partitionBy(*part)
            .orderBy("dday")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_same = Window.partitionBy(*part, "dday")
        return (
            df.withColumn("mx_prev", F.max("o_totalprice").over(w_prev))
            .withColumn("mx_same", F.max("o_totalprice").over(w_same))
            .where(
                (F.col("mx_prev").isNull() | (F.col("o_totalprice") > F.col("mx_prev")))
                & (F.col("o_totalprice") == F.col("mx_same"))
            )
            .drop("mx_prev", "mx_same")
        )

    local = skyline_pass(d.withColumn("mon", F.trunc("o_orderdate", "month")), "mon").drop("mon")
    return skyline_pass(local).select("o_orderkey", "o_orderdate", "o_totalprice")


# ---------------------------------------------------------------------------
# Iterative weighted PageRank over the customer-nation → supplier-nation
# trade graph (the repo's canonical iterative-algorithm shape)
# ---------------------------------------------------------------------------

_PR_EDGES_SQL = """
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
"""

# Deterministic left-fold sum in DuckDB: list built in key order, folded left.
_PR_FOLD = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list({val} ORDER BY {key})), (a, x) -> a + x)"
)


def _pr_iter_sql(prev: str, nxt: str) -> str:
    """One unrolled PageRank iteration as DuckDB CTE fragments."""
    contrib = _PR_FOLD.format(val="e.p * r.rank", key="e.src")
    mass = _PR_FOLD.format(val="r.rank", key="r.node")
    return f"""
    c_{nxt} AS (
      SELECT e.dst AS node, {contrib} AS contrib
      FROM pedges e JOIN {prev} r ON e.src = r.node
      GROUP BY e.dst
    ),
    d_{nxt} AS (
      SELECT coalesce({mass}, CAST(0 AS DOUBLE)) AS mass
      FROM {prev} r LEFT JOIN outs o ON r.node = o.src
      WHERE o.src IS NULL
    ),
    {nxt} AS (
      SELECT nd.node,
             CAST(0.15 AS DOUBLE) / cnt.n
               + CAST(0.85 AS DOUBLE)
                 * (coalesce(c.contrib, CAST(0 AS DOUBLE)) + d.mass / cnt.n) AS rank
      FROM nodes nd
      LEFT JOIN c_{nxt} c ON nd.node = c.node, d_{nxt} d, cnt
    )"""


@query(
    "graph_pagerank_trade",
    oracle=f"""
    WITH edges AS ({_PR_EDGES_SQL}),
    pedges AS (
      SELECT src, dst, CAST(w AS DOUBLE)
               / CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS p
      FROM edges
    ),
    outs AS (SELECT DISTINCT src FROM edges),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nation),
    r0 AS (SELECT node, CAST(1 AS DOUBLE) / cnt.n AS rank FROM nodes, cnt),
    {_pr_iter_sql("r0", "r1")},
    {_pr_iter_sql("r1", "r2")},
    {_pr_iter_sql("r2", "r3")}
    SELECT node, round(rank, 10) AS rank FROM r3
    """,
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 iterations, dangling mass
    redistributed uniformly) over the nation-level trade graph distilled
    from lineitem ⋈ orders ⋈ customer ⋈ supplier.

    Scale design: the heavy part — distilling edges from the fact table —
    is one shuffle-agg and is PERSISTED once, because every iteration
    re-joins it; each iteration is then edges ⋈ ranks (partitioned on the
    join key) + a groupBy(dst). Ranks stay (node, rank) — tiny relative to
    edges — and the loop never collects to the driver. Cross-engine
    determinism: per-destination contributions and the dangling mass are
    summed as LEFT FOLDS over src-/node-sorted lists, so Spark and DuckDB
    add the same doubles in the same order; 3 fixed iterations, no
    convergence test, so both engines run the identical computation.
    """
    from ibc_spark.ext.persistreg import persist_tracked

    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    cu = read_table(spark, sf_dir, "customer")
    su = read_table(spark, sf_dir, "supplier")
    na = read_table(spark, sf_dir, "nation")

    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .groupBy(cu.c_nationkey.alias("src"), su.s_nationkey.alias("dst"))
        .agg(F.count("*").alias("w"))
    )
    w_out = Window.partitionBy("src")
    pedges = persist_tracked(
        edges.select(
            "src", "dst", (F.col("w").cast("double") / F.sum("w").over(w_out)).alias("p")
        )
    )
    outs = pedges.select("src").distinct()
    nodes = na.select(F.col("n_nationkey").alias("node"))
    cnt = na.agg(F.count("*").cast("double").alias("n"))

    def fold_sum(pairs: F.Column) -> F.Column:
        # identical left fold to the oracle's list_reduce(list_prepend(0, ...))
        return F.aggregate(F.array_sort(pairs), F.lit(0.0), lambda a, x: a + x["v"])

    ranks = nodes.crossJoin(F.broadcast(cnt)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(3):
        contrib = (
            pedges.join(ranks, pedges.src == ranks.node)
            .select("dst", F.struct(F.col("src").alias("k"), (F.col("p") * F.col("rank")).alias("v")).alias("kv"))
            .groupBy("dst")
            .agg(fold_sum(F.collect_list("kv")).alias("contrib"))
        )
        dangling = (
            ranks.join(outs, ranks.node == outs.src, "left_anti")
            .agg(
                fold_sum(
                    F.collect_list(F.struct(F.col("node").alias("k"), F.col("rank").alias("v")))
                ).alias("mass")
            )
        )
        ranks = (
            nodes.join(contrib, contrib.dst == nodes.node, "left")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(F.broadcast(cnt))
            .select(
                "node",
                (
                    F.lit(0.15) / F.col("n")
                    + F.lit(0.85)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("mass") / F.col("n")
                    )
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 10).alias("rank"))


# ---------------------------------------------------------------------------
# Fixed-iteration k-means (Lloyd) over the embeddings table
# ---------------------------------------------------------------------------

_KM_K = 4
_KM_DIM = 64

# Squared-L2 between two double lists, folded in index order (zip preserves
# position, so the fold order is identical on both engines).
_KM_DIST = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(list_zip({a}, {b}), p -> (p[1]-p[2])*(p[1]-p[2]))),"
    " (acc, x) -> acc + x)"
)
_KM_FOLD_BY_VEC = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list({val} ORDER BY vec_id)), (a, x) -> a + x)"
)


def _km_assign_sql(cents: str, out: str) -> str:
    dist = _KM_DIST.format(a="e.v", b="c.cv")
    return f"""
    d_{out} AS (
      SELECT e.vec_id, e.v, c.cid, {dist} AS dist
      FROM emb e, {cents} c
    ),
    {out} AS (
      SELECT vec_id, v, cid, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d_{out}
      ) WHERE rn = 1
    )"""


@query(
    "kmeans_embeddings_2iter",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    c0 AS (
      SELECT vec_id AS cid, v AS cv FROM emb ORDER BY vec_id LIMIT {_KM_K}
    ),
    {_km_assign_sql("c0", "a1")},
    m1 AS (
      SELECT cid, i AS pos,
             {_KM_FOLD_BY_VEC.format(val="v[i]")} / count(*) AS mu
      FROM a1, generate_series(1, {_KM_DIM}) t(i)
      GROUP BY cid, i
    ),
    c1 AS (SELECT cid, list(mu ORDER BY pos) AS cv FROM m1 GROUP BY cid),
    {_km_assign_sql("c1", "a2")}
    SELECT cid, count(*) AS n_members,
           round({_KM_FOLD_BY_VEC.format(val="dist")}, 6) AS inertia
    FROM a2
    GROUP BY cid
    """,
)
def kmeans_embeddings_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means (k=4, deterministic init = the four
    lowest vec_ids), reporting per-cluster size and inertia after the
    second assignment.

    Scale design: centroids are O(k·dim) — always broadcast; each
    assignment pass is a broadcast crossJoin + one narrow argmin window
    per vec_id (no shuffle of the vectors themselves beyond the window);
    the centroid update is a posexplode → (cid, pos) partial aggregation,
    i.e. map-side combinable and shuffle-bounded by k·dim groups, not by
    rows. That loop shape holds at any corpus size; more iterations are
    the same stages repeated. Determinism: distances fold the squared
    diffs in index order; centroid means and inertia fold member values in
    vec_id order — the same left-fold the DuckDB oracle runs, so doubles
    match bit-for-bit and assignments (ties broken by cid) agree exactly.
    """
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    c0 = (
        emb.orderBy("vec_id")
        .limit(_KM_K)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )

    def assign(cents: DataFrame) -> DataFrame:
        d = emb.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            "v",
            "cid",
            F.aggregate(
                F.zip_with("v", "cv", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("dist"),
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        return d.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")

    def fold_by_vec(val: F.Column) -> F.Column:
        kv = F.collect_list(F.struct(F.col("vec_id").alias("k"), val.alias("x")))
        return F.aggregate(F.array_sort(kv), F.lit(0.0), lambda a, p: a + p["x"])

    a1 = assign(c0)
    m1 = (
        a1.select("vec_id", "cid", F.posexplode("v").alias("pos0", "val"))
        .groupBy("cid", (F.col("pos0") + 1).alias("pos"))
        .agg((fold_by_vec(F.col("val")) / F.count("*")).alias("mu"))
    )
    c1 = m1.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mu"))), lambda s: s["mu"]
        ).alias("cv")
    )
    a2 = assign(c1)
    return a2.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.round(fold_by_vec(F.col("dist")), 6).alias("inertia"),
    )
