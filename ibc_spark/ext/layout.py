"""Data-layout operators for the 100 TB lakehouse (SURVEY §7.7 extension).

Z-order (Morton) clustering keys and compaction bin-packing — the two
maintenance primitives a petabyte table needs so that *future* scans prune:

- ``morton_key``: interleave the bits of two quantized dimensions so that a
  range-partition on the key yields files that are rectangles in (x, y)
  space; a predicate on EITHER dimension then prunes most files via
  parquet min/max footers. Pure integer Column expressions — codegen'd,
  zero shuffle; the only shuffle in a full re-layout job is the final
  ``repartitionByRange(z_key)`` write.
- ``bin_pack_by_size``: assign ordered units (files, partitions) to output
  bins of ~``target`` rows via a running prefix sum — the planning step of
  small-file compaction. One window over units (units ≪ rows), then the
  rewrite itself is a partition-local coalesce.

Parity note: quantization uses ``floor((v - min) * levels / span)`` in
DOUBLE — written with the same literal expression shape as the DuckDB
oracles so IEEE evaluation is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantize_minmax(c: Column | str, cmin: Column, cmax: Column, levels: int) -> Column:
    """Monotone quantization of ``c`` into ``[0, levels)`` given bounds.

    ``least(levels-1, ...)`` guards the max element landing exactly on the
    upper edge. The ``span + 1`` / ``span + 1e-9`` choice is the caller's —
    pass pre-built bound columns.
    """
    c = F.col(c) if isinstance(c, str) else c
    q = F.floor((c.cast("double") - cmin) * float(levels) / (cmax - cmin))
    return F.least(F.lit(levels - 1), q.cast("int"))


def morton_key(qx: Column, qy: Column, bits: int = 4) -> Column:
    """Interleave ``bits`` low bits of two quantized dims: x in odd
    positions, y in even — the classic Z-order curve key.

    Unrolled shift/mask tree (no UDF, whole-stage codegen). For production
    multi-column layouts raise ``bits`` and chain pairs.
    """
    z = F.lit(0)
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i))
    return z


def morton_sql(qx: str, qy: str, bits: int = 4) -> str:
    """The DuckDB-dialect twin of :func:`morton_key` (| of shifted bits)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({qx} >> {i}) & 1) << {2 * i + 1})")
        parts.append(f"((({qy} >> {i}) & 1) << {2 * i})")
    return " | ".join(parts)


def bin_pack_by_size(
    units: DataFrame, *, order_col: str, size_col: str, target: int, out_col: str = "bin"
) -> DataFrame:
    """Assign ordered units to compaction bins of ~``target`` total size.

    ``bin = floor((running_sum - size) / target)`` — the standard greedy
    prefix-sum packing: a unit opens a new bin once the *preceding* mass
    crosses a target boundary. The single-partition window is over UNITS
    (file/partition counts — thousands, not rows), so the plan is safe at
    100 TB; the row-scale work stays in the rewrite, not the plan.
    """
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run = F.sum(size_col).over(w)
    return units.withColumn(out_col, F.floor((run - F.col(size_col)) / F.lit(target)).cast("bigint"))


# Bucketed tables already (re)written this session, so repeated invocations
# (bench runs each entry 3×) pay the write exactly once per (table, session).
_BUCKETED_READY: set[str] = set()


def ensure_bucketed_table(
    spark, df: DataFrame, name: str, key: str, buckets: int = 8
) -> None:
    """Materialize ``df`` as a warehouse table hash-BUCKETED (and
    bucket-sorted) on ``key`` — Spark's persisted co-location primitive:
    a scan of a bucketed table reports HashPartitioning(key, buckets), so
    a join of two tables bucketed the same way needs NO Exchange on
    either side. This is the physical design that turns the recurring
    big-big join at 100 TB from two full shuffles per run into zero —
    the shuffle is paid ONCE at write time and amortized over every
    subsequent query.

    Re-written at most once per (table, session): the memo set guards
    repeat invocations, the catalog check guards a fresh session reusing
    a warehouse directory whose in-memory catalog entry is gone.
    """
    if name in _BUCKETED_READY and spark.catalog.tableExists(name):
        return
    # A fresh session's in-memory catalog has forgotten the table, but the
    # warehouse DIRECTORY survives — and managed-table creation refuses an
    # existing location (LOCATION_ALREADY_EXISTS) even under overwrite.
    # Drop both the catalog entry and the stale directory.
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    import shutil
    from urllib.parse import unquote, urlparse

    # unquote: the warehouse URI percent-encodes path characters (spaces in
    # tmp dirs), and rmtree on the encoded spelling would silently miss
    wh = unquote(urlparse(spark.conf.get("spark.sql.warehouse.dir")).path)
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )
    _BUCKETED_READY.add(name)
