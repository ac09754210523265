"""Iterative graph operators: connected components for dedup clustering.

Near-dup pair lists (ext.dedup) are edges; the unit of deduplication is the
CONNECTED COMPONENT (a dup cluster keeps one representative). This module
computes components with iterative min-label propagation — the alternating
large-star/small-star formulation (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) simplified to its label-propagation core:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until no label changes. Each iteration is one self-join + one
aggregation (two shuffles on the node key); convergence takes O(log n)
iterations on real dup graphs (diameter is tiny — dup clusters are dense).

Scale notes:
- state per iteration is one (node, label) frame, re-partitioned on node —
  never collected to the driver; the convergence check is a 1-row count.
- ``localCheckpoint`` truncates lineage each iteration (without it the plan
  doubles per iteration and the driver OOMs planning long loops).
- labels are the min node id of the component → deterministic output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id reachable. Edges are undirected (symmetrized internally)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # neighbor's current label, keyed by the receiving node
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "v"), on="v")
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("u", "node")
        )
        updated = (
            labels.join(neighbor_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
                (
                    F.col("nbr_component").isNotNull()
                    & (F.col("nbr_component") < F.col("component"))
                ).alias("__changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = updated.where(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if n_changed == 0:
            break
    return labels


def dedup_clusters(
    pairs: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Collapse near-dup pairs into clusters: (component=kept id, member,
    is_kept). Downstream dedup keeps ``is_kept`` rows only."""
    cc = connected_components(pairs, src=src, dst=dst)
    return cc.select(
        F.col("component").alias("kept_id"),
        F.col("node").alias("member_id"),
        (F.col("node") == F.col("component")).alias("is_kept"),
    )
