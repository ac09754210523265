"""Remaining TPC-H query shapes — the analytical patterns not yet covered by
the headline set in ``registry.py``.

The reference (`/root/reference`, see SURVEY.md §2.7) has no analytical
queries at all; these entries exist to make the engine's coverage of the
standard warehouse query shapes explicit and oracle-checked: correlated
EXISTS / NOT EXISTS (Q4/Q22), pure-scan aggregation with full predicate
pushdown (Q6), multi-dim fact joins with CASE aggregation (Q7/Q9/Q14),
aggregate-then-top-k (Q10), HAVING against a global scalar (Q11),
argmax-by-aggregate (Q15), distinct-count with NOT-IN exclusion (Q16),
correlated-average filters (Q17), disjunctive OR-of-ANDs predicates (Q19),
and aggregate-driven semi-join chains (Q20).

Determinism rules are the same as registry.py: every float aggregate goes
through a pinned-scale DECIMAL so Spark and DuckDB hash identically; final
doubles are produced by exactly one cast/division on both sides; every
computed column is aliased identically in the Spark plan and the oracle.

Scale posture (100 TB): every query here is a scan → (shuffle) join →
partial+final agg pipeline with no driver-side collection. `nation` /
`region` (25 / 5 rows) are broadcast explicitly; `part` and `supplier`
scale with the data and are left to sort-merge/AQE; per-group aggregates
that feed a second join (Q11/Q15/Q17/Q20) reduce to one row per key before
the join, so the second shuffle moves group-level — not row-level — data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ibc_spark.io_.sources import read_table
from ibc_spark.registry_core import dec, query


@query(
    "q4_exists_late_items",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_exists_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an extra non-equi condition
    (item shipped after the order date), expressed as a LEFT SEMI join.
    Semi joins short-circuit per probe row and never duplicate the left
    side, so the aggregate input stays exactly one row per order."""
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount > 0.04 AND l_discount < 0.08
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table scan, every predicate pushed into the
    parquet reader, one global aggregate. At 100 TB this is the query that
    proves pushdown + column pruning: only 4 of 11 lineitem columns are
    read and row groups outside the shipdate range are skipped via
    min/max statistics."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") > 0.04)
        & (F.col("l_discount") < 0.08)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec("l_extendedprice", 10, 2) * dec("l_discount", 4, 2))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l_shipdate) AS INTEGER)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension (nation) joined twice under two
    roles (supplier's vs customer's), with a symmetric pair predicate and a
    per-year CASE-free rollup.

    Scale posture: the two-nation filter is pushed THROUGH the dimension
    joins before the fact-fact shuffle — supplier and customer are each
    pre-joined to the (broadcast) two-row nation subset, so both legs of
    the lineitem⋈orders join carry only ~2/|nation| of their rows into the
    shuffle. Joining the full facts first and filtering after the nation
    joins (the naive plan) shuffles ~12× more data at TPC-H nation
    cardinality. The residual symmetric pair predicate (which excludes the
    N1–N1 / N2–N2 combinations) runs on the already-reduced join output.
    The shrunken supplier/customer sides are left to AQE to promote to
    broadcast when they fit."""
    nations = ["NATION_1", "NATION_2"]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = (
        read_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(nations))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        read_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(nations))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    s2 = s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    c2 = c.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    revenue = dec("l_extendedprice", 10, 2) * (
        F.lit(1) - dec("l_discount", 4, 2)
    ).cast("decimal(4,2)")
    li2 = li.join(s2, F.col("l_suppkey") == F.col("s_suppkey"))
    o2 = o.join(c2, F.col("o_custkey") == F.col("c_custkey"))
    return (
        li2.join(o2, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(revenue).cast("double").alias("volume"))
    )


@query(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n_name, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, CAST(YEAR(o_orderdate) AS INTEGER)
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: 5-table star with a substring filter on the part
    dimension and a (nation, year) rollup. The LIKE filter shrinks `part`
    before it joins the fact table — at scale the filtered part side is
    what AQE converts to a broadcast."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = read_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%")).select(
        "p_partkey"
    )
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = dec("l_extendedprice", 10, 2) * (
        F.lit(1) - dec("l_discount", 4, 2)
    ).cast("decimal(4,2)")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(revenue).cast("double").alias("profit"))
    )


@query(
    "q10_returned_items_topk",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                 * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) DESC,
             c_custkey
    LIMIT 20
    """,
)
def q10_returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: aggregate then top-k. The sort key is the EXACT
    decimal sum (identical ordering on both engines; ties broken by
    c_custkey) and the limit is pushed into TakeOrderedAndProject — no
    global sort materializes at any scale."""
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    ).select("o_orderkey", "o_custkey")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = dec("l_extendedprice", 10, 2) * (
        F.lit(1) - dec("l_discount", 4, 2)
    ).cast("decimal(4,2)")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).alias("revenue_dec"))
        .orderBy(F.col("revenue_dec").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("revenue_dec").cast("double").alias("revenue"),
        )
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH tot AS (
      SELECT SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS total,
             COUNT(DISTINCT l_partkey) AS n_parts
      FROM lineitem
    )
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS part_value
    FROM lineitem, tot
    GROUP BY l_partkey, total, n_parts
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(10,2))) * n_parts * 10 > total * 12
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group aggregate filtered against a global
    scalar aggregate (HAVING sum > fraction-of-total). The fraction is
    scale-free — parts worth more than 1.2x the average part value — so
    the query returns rows at every SF (a fixed fraction of total, as in
    literal Q11, selects nothing once part count grows). The comparison is
    cross-multiplied (`value * n_parts * 10 > total * 12`) so it stays in
    exact integer/decimal arithmetic on both engines; the global
    (total, n_parts) pair is a broadcast one-row frame."""
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice", 10, 2)).alias("value_dec")
    )
    # Two-level aggregate: the global (total, n_parts) derives from per_part
    # (sum of group sums / count of groups), so both branches consume the
    # SAME groupBy exchange — one lineitem scan, one shuffle, ReusedExchange
    # on the second branch (asserted in tests/test_plans.py). n_parts counts
    # the KEY column so a NULL-partkey group is excluded, matching the
    # oracle's COUNT(DISTINCT l_partkey); total sums every group including a
    # NULL one, matching the oracle's unfiltered SUM.
    total = per_part.agg(
        F.sum("value_dec").alias("total"),
        F.count(F.col("l_partkey")).alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value_dec") * F.col("n_parts") * 10 > F.col("total") * 12)
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


@query(
    "q14_promo_revenue_pct",
    oracle="""
    SELECT CAST(100 * SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(10,2))
                         * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
                    ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                      * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                  AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-02-01'
    """,
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio (promo revenue share).
    Numerator and denominator are exact decimal sums computed in the same
    partial-aggregate pass; the percentage is produced by exactly one
    double division, written identically in the oracle."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = dec("l_extendedprice", 10, 2) * (
        F.lit(1) - dec("l_discount", 4, 2)
    ).cast("decimal(4,2)")
    zero = F.lit(0).cast("decimal(10,2)")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", revenue).otherwise(zero)).alias(
                "promo_dec"
            ),
            F.sum(revenue).alias("total_dec"),
        )
        .select(
            (
                (F.col("promo_dec") * 100).cast("double")
                / F.col("total_dec").cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                 * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
               AS total_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_dec = (SELECT MAX(total_dec) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax by aggregate — revenue per supplier for a
    quarter, then the supplier(s) hitting the maximum. The max is a
    broadcast one-row frame; equality on exact decimals keeps the answer
    identical across engines (double max comparison would not be)."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    revenue = dec("l_extendedprice", 10, 2) * (
        F.lit(1) - dec("l_discount", 4, 2)
    ).cast("decimal(4,2)")
    rev = li.groupBy("l_suppkey").agg(F.sum(revenue).alias("total_dec"))
    mx = rev.agg(F.max("total_dec").alias("max_dec"))
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_dec") == F.col("max_dec"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_dec").cast("double").alias("total_revenue"))
    )


@query(
    "q16_supplier_cnt_by_brand",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 10, 20, 30, 40, 50)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_cnt_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) per attribute combo with a NOT-IN
    exclusion list. The exclusion (suppliers in deficit) is an anti join —
    the distributed-safe form of NOT IN when the subquery is guaranteed
    non-null. Distinct-count shuffles (brand, size, suppkey) once, then
    counts per group."""
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = read_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 10, 20, 30, 40, 50)
    ).select("p_partkey", "p_brand", "p_size")
    bad = read_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "leftanti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH stats AS (
      SELECT l_partkey AS sp_partkey, COUNT(*) AS cnt,
             SUM(CAST(l_quantity AS DECIMAL(10,2))) AS sum_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part  ON p_partkey = l_partkey
    JOIN stats ON sp_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND CAST(l_quantity AS DECIMAL(10,2)) * 2 * cnt < sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below half their group's average — the
    correlated scalar-subquery pattern, decorrelated into an
    aggregate-then-join-back. The `qty < 0.5 * avg` predicate is
    cross-multiplied to `2 * qty * cnt < sum` so it evaluates in exact
    decimal arithmetic on both engines (a double average would make
    boundary rows engine-dependent)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    stats = li.groupBy(F.col("l_partkey").alias("sp_partkey")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("l_quantity", 10, 2)).alias("sum_qty"),
    )
    p = read_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3").select(
        "p_partkey"
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(stats, F.col("sp_partkey") == F.col("l_partkey"))
        .where(dec("l_quantity", 10, 2) * 2 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(dec("l_extendedprice", 10, 2)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Catalyst
    factors the common sub-predicates: the brand/size disjunction is pushed
    to the part scan and the quantity envelope (1..30) to the lineitem
    scan, so each side is pruned before the join even though no single
    conjunct applies globally."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    revenue = dec("l_extendedprice", 10, 2) * (
        F.lit(1) - dec("l_discount", 4, 2)
    ).cast("decimal(4,2)")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q20_promo_volume_suppliers",
    oracle="""
    WITH qualifying AS (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(10,2))) > 100
    )
    SELECT n_name, COUNT(*) AS promo_suppliers
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM qualifying)
    GROUP BY n_name
    """,
)
def q20_promo_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: an aggregate-derived key set driving a semi join
    (suppliers who moved >100 units of PROMO parts in a year, counted per
    nation). The HAVING reduces the fact table to one row per supplier
    before the semi join, so the join input is group-sized, not
    row-sized."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    p = read_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    qualifying = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity", 10, 2)).alias("sum_qty"))
        .where(F.col("sum_qty") > 100)
        .select("l_suppkey")
    )
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "leftsemi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("promo_suppliers"))
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
    WITH pos AS (
      SELECT COUNT(*) AS cnt, SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS total
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(12,2)) * cnt > total
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate < TIMESTAMP '1996-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: NOT EXISTS anti join + a filter against a global
    average (customers above the mean positive balance with no orders
    before 1996 — every synthetic customer eventually orders, so the
    window-less literal Q22 predicate would select nothing).
    `bal > avg` is cross-multiplied to `bal * cnt > sum` so the threshold
    is exact-decimal on both engines; the (cnt, sum) scalar pair is a
    broadcast one-row frame."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    pos = c.where(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("c_acctbal", 12, 2)).alias("total"),
    )
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1996-01-01"
    ).select("o_custkey")
    return (
        c.join(F.broadcast(pos))
        .where(dec("c_acctbal", 12, 2) * F.col("cnt") > F.col("total"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "leftanti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey AS b_partkey, MIN(unit_cost) AS min_cost
      FROM supply GROUP BY l_partkey
    )
    SELECT p_partkey, p_type, s_name, n_name, s_acctbal,
           min_cost
    FROM supply
    JOIN best     ON l_partkey = b_partkey AND unit_cost = min_cost
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size <= 5
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated MIN subquery, adapted: the testdata has no
    partsupp table, so lineitem is the part↔supplier bridge and the "supply
    cost" is the minimum observed unit price). Decorrelated the standard
    way: per-(part, supplier) aggregate, then a per-part MIN, then a join
    back on the min — two group-level shuffles instead of a per-row
    correlated probe. MIN of doubles is order-insensitive and returns one
    of its inputs, so the float-equality join-back is exact on both
    engines. The small filtered `part` side and the 25-row `nation` are
    broadcast; ties on the minimum keep all winning suppliers (same rows in
    both engines)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    supply = (
        li.join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
        )
    )
    best = supply.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = read_table(spark, sf_dir, "part").where(F.col("p_size") <= 5)
    return (
        supply.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_type", "s_name", "n_name", "s_acctbal", "min_cost")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
           CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_2'
                      THEN CAST(l_extendedprice AS DECIMAL(10,2))
                           * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
                      ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE)
                / CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                           * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                       AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    GROUP BY CAST(YEAR(o_orderdate) AS INTEGER)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — a conditional-aggregate
    ratio over a 7-table star (nation joined twice under customer and
    supplier roles). Numerator and denominator are exact decimal sums; the
    share is one double division per year group.

    Scale posture: both selective dimension filters are pushed into the
    fact legs BEFORE the lineitem⋈orders shuffle — lineitem is pre-joined
    to the broadcast PROMO part subset, and orders is pre-joined to the
    ASIA customer subset (customer ⋈ broadcast asia-nation keys), so the
    fact-fact join shuffles only promo lineitems against ASIA orders
    (~region-fraction of orders) instead of the full tables. The supplier
    leg joins the reduced output; nation/region/part stay broadcast, and
    AQE promotes the shrunken customer side when it fits."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_cust_nations = (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    p = read_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    vol = dec("l_extendedprice", 10, 2) * (
        F.lit(1) - dec("l_discount", 4, 2)
    ).cast("decimal(4,2)")
    c_asia = c.join(F.broadcast(asia_cust_nations), F.col("c_nationkey") == F.col("cn_key")).select(
        "c_custkey"
    )
    o_asia = o.join(c_asia, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_orderdate"
    )
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o_asia, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
    )
    zero = F.lit(0).cast("decimal(12,4)")
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(zero))
            .cast("double")
            .alias("num"),
            F.sum(vol).cast("double").alias("den"),
        )
        .select(
            "o_year", (F.col("num") / F.col("den")).cast("double").alias("mkt_share")
        )
    )


@query(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: the testdata carries no l_shipmode /
    receipt & commit dates, so the grouping key is l_linestatus and "late"
    is shipped-after-ordered). The signature pattern survives intact:
    fact-fact equi join with a non-equi residual predicate, then CASE-sum
    pivoted counts. The date range prunes the lineitem scan via parquet
    row-group stats before the shuffle."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, n_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders   ON l1.l_orderkey = o_orderkey
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate
      )
    GROUP BY s_name, n_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    finished multi-supplier order — a correlated EXISTS plus a correlated
    NOT EXISTS over the same fact table, i.e. a left-semi and a left-anti
    self-join on l_orderkey. All three lineitem legs prune to three
    columns; the semi/anti probes shuffle on the order key they already
    share with the main leg, so AQE plans them as co-partitioned
    shuffle-hash joins rather than broadcasting the 600k-row fact ("late"
    = shipped after order date, as in q4 — testdata has no receipt /
    commit dates)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    l1 = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    l3 = (
        li.join(
            o.select(
                F.col("o_orderkey").alias("o3_orderkey"),
                F.col("o_orderdate").alias("o3_orderdate"),
            ),
            F.col("l_orderkey") == F.col("o3_orderkey"),
        )
        .where(F.col("l_shipdate") > F.col("o3_orderdate"))
        .select(
            F.col("l_orderkey").alias("y_orderkey"),
            F.col("l_suppkey").alias("y_suppkey"),
        )
    )
    waiting = l1.join(
        l2,
        (F.col("x_orderkey") == F.col("l_orderkey"))
        & (F.col("x_suppkey") != F.col("l_suppkey")),
        "leftsemi",
    ).join(
        l3,
        (F.col("y_orderkey") == F.col("l_orderkey"))
        & (F.col("y_suppkey") != F.col("l_suppkey")),
        "leftanti",
    )
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )

# ---------------------------------------------------------------------------
# Headline TPC-H entries (q1/q3/q5/q13/q18) — moved here from registry.py in
# round 10 (VERDICT r9 #7): names, oracles, and plans unchanged; this file
# is where the rest of the TPC-H family already lives.
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(10,2))
                         * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
                    AS DECIMAL(16,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(10,2))
                              * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
                         AS DECIMAL(16,4))
                         * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))
                    AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: single scan, map-side partial agg
    into a 6-group aggregate — the canonical whole-stage-codegen pipeline."""
    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= "2000-12-01"
    )
    one_minus_disc = (F.lit(1) - dec("l_discount", 4, 2)).cast("decimal(4,2)")
    one_plus_tax = (F.lit(1) + dec("l_tax", 4, 2)).cast("decimal(4,2)")
    disc_price = (dec("l_extendedprice", 10, 2) * one_minus_disc).cast("decimal(16,4)")
    charge = (disc_price * one_plus_tax).cast("decimal(18,6)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", 10, 2)).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice", 10, 2)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (
                F.sum(dec("l_quantity", 10, 2)).cast("double") / F.count(F.lit(1))
            ).alias("avg_qty"),
            (
                F.sum(dec("l_discount", 4, 2)).cast("double") / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE)
               AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate < TIMESTAMP '1996-07-01'
      AND l_shipdate  > TIMESTAMP '1996-07-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped top-k: join + group + global top-10.

    The ORDER BY ... LIMIT compiles to Spark's TakeOrderedAndProject — a
    per-partition top-k then a k-row merge on the driver, NOT a global sort;
    this is the shape that survives a 100× scale-up.
    """
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1996-07-01")
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1996-07-01"
    )
    revenue = dec("l_extendedprice", 10, 2) * (
        F.lit(1) - dec("l_discount", 4, 2)
    ).cast("decimal(4,2)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE)
               AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier volume (customer and supplier in the
    same nation). supplier + nation broadcast; facts shuffle once each."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice", 10, 2) * (
        F.lit(1) - dec("l_discount", 4, 2)
    ).cast("decimal(4,2)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer distribution INCLUDING
    zero-order customers (left join preserves them; COUNT of the nullable
    key counts only matches). Two aggregations, the second over a tiny
    domain."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q18_large_orders_having",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_custkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(10,2))) > 150
    """,
)
def q18_large_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: post-aggregation HAVING filter on an exact-decimal
    sum (the filter still applies AFTER the aggregation shuffle —
    Catalyst cannot push it, which is the point of the shape).

    Plan (round 9): EAGER AGGREGATION BELOW THE JOIN — sum l_quantity per
    l_orderkey and apply the HAVING cut BEFORE touching orders. The sum
    is independent of o_custkey (o_orderkey is the orders key, so custkey
    is functionally dependent on the group), so this is the classic
    semantics-preserving eager-aggregation rewrite Catalyst does not do
    itself: the big-big join (60 M lineitem × 15 M orders at sf10, which
    measured a 1.32 per-decade exponent and 120 s) becomes a map-side-
    combinable aggregation plus a join against only the FILTERED
    heavy-order keys — few enough that AQE broadcasts them."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    heavy = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 10, 2)).alias("total_qty_dec"))
        .where(F.col("total_qty_dec") > 150)
    )
    return (
        heavy.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("total_qty_dec").cast("double").alias("total_qty"),
        )
    )
