"""Bounded deterministic two-level tree fold + Lloyd-assignment SQL spec.

LEAF module (imports nothing from the registry packages) so that BOTH
`registry_lakehouse` and `registry_extras` can use these pieces at
module-evaluation time without a circular import: `registry_extras`'s
SemDeDup oracle is built while the registry package is still initializing,
and importing them from `registry_lakehouse` there made a direct
`import ibc_spark.registry_lakehouse` blow up on the partially-initialized
module.

The fold itself (round 7, closing VERDICT r6 #1): round 6 flagged the
single-level deterministic fold (``array_sort(collect_list(struct(key,
x)))`` then ``F.aggregate``) as a scale killer — the whole group's members
sit in ONE aggregation buffer, O(n) per group for the power-iteration
per-position sums. The fix keeps bit-exact cross-engine determinism while
bounding state: fold values in key order WITHIN fixed-width key buckets
(level 1, <= _FOLD_B structs per aggregation group), then fold the bucket
partials in bucket order (level 2, <= n/_FOLD_B partials per group — 128x
smaller; the construction nests to log_B(n) levels if a corpus ever
outgrows two, and the training-side alternative is km_train's
``sample_mod`` hash-sample). Both engines run the identical (bucket,
order) fold tree, so doubles agree bit-for-bit. _FOLD_B = 128 so the
driver SF (500 vectors) genuinely exercises multiple buckets per group.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_FOLD_B = 128

# Level-1 DuckDB fold: {val} folded in vec_id order within one bucket.
_FOLD_PARTIAL = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list({val} ORDER BY vec_id)), (a, x) -> a + x)"
)
# Level-2 DuckDB fold: bucket partials folded in bucket (bkt) order.
_FOLD_BUCKETS = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list({val} ORDER BY bkt)), (a, x) -> a + x)"
)


def _fold_bkt() -> F.Column:
    """The level-1 bucket key: vec_id DIV _FOLD_B (oracle: vec_id // B)."""
    return F.expr(f"vec_id DIV {_FOLD_B}").alias("bkt")


def _ordered_fold(key: F.Column, val: F.Column) -> F.Column:
    """Fold ``val`` in ``key`` order — deterministic left fold, identical to
    the oracle's ``list_reduce(... list(val ORDER BY key))``. Callers MUST
    bound the group (level-1: the _FOLD_B-wide bucket; level-2: bucket
    partials; O(dim) frames) — never a whole corpus-scale group."""
    kv = F.collect_list(F.struct(key.alias("k"), val.alias("x")))
    return F.aggregate(F.array_sort(kv), F.lit(0.0), lambda a, p: a + p["x"])


# --- portable md5 double hashing (Kirsch–Mitzenmacher) ---------------------
#
# THE one definition of the h1/h2 bases used by the Bloom-filter and
# Count-Min entries, in both spellings, so the Spark, DuckDB, and (via the
# pinned equality test) hashlib copies cannot drift (review r7): h1 = first
# 60 md5 bits, h2 = next 60 bits forced odd; position i = (h1 + i*h2) % m.
# i ≤ 4 keeps h1 + i*h2 inside int64.


def md5_double_hash(g: F.Column) -> tuple[F.Column, F.Column]:
    """Column spelling over an already-string column."""
    h = F.md5(g)
    h1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 16, 15), 16, 10).cast("long") * 2 + 1
    return h1, h2


def md5_double_hash_sql(expr: str) -> str:
    """DuckDB spelling: an ``h1, h2`` select-list fragment over ``expr``
    (a VARCHAR expression)."""
    return (
        f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT) AS h1,"
        f" CAST(('0x' || substr(md5({expr}), 16, 15)) AS BIGINT) * 2 + 1 AS h2"
    )


def md5_double_hash_py(g: str) -> tuple[int, int]:
    """hashlib spelling over a UTF-8 string — the executor-local form the
    Arrow-batched Bloom probe uses. Byte agreement with the Column/SQL
    spellings above is pinned by ``test_streaming_bloom_gate_equals_batch``
    (Spark's ``md5`` hashes the same UTF-8 bytes hashlib does)."""
    import hashlib

    h = hashlib.md5(g.encode("utf-8")).hexdigest()
    return int(h[:15], 16), int(h[15:30], 16) * 2 + 1


# --- fixed-iteration Lloyd (k-means) SQL spec ------------------------------

_KM_K = 4
_KM_DIM = 64

# Squared-L2 between two double lists, folded in index order (zip preserves
# position, so the fold order is identical on both engines).
_KM_DIST = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(list_zip({a}, {b}), p -> (p[1]-p[2])*(p[1]-p[2]))),"
    " (acc, x) -> acc + x)"
)


def _km_assign_sql(cents: str, out: str, src: str = "emb") -> str:
    dist = _KM_DIST.format(a="e.v", b="c.cv")
    return f"""
    d_{out} AS (
      SELECT e.vec_id, e.v, c.cid, {dist} AS dist
      FROM {src} e, {cents} c
    ),
    {out} AS (
      SELECT vec_id, v, cid, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d_{out}
      ) WHERE rn = 1
    )"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch — THE one definition of the 60-bit md5
# value hash and the (k-1)/u_(k) estimator, in all three dialects (Spark
# Column / DuckDB SQL / plain Python). Review r8: the spellings had grown
# to ~9 sites across the sketch entries, the streaming updater, and the
# cross-source matrix; any estimator tweak must now touch exactly these.
# ---------------------------------------------------------------------------


def kmv_hash(v: F.Column) -> F.Column:
    """60-bit uniform value hash: first 15 md5 hex chars as a long.
    NULL in → NULL out (callers drop NULLs on BOTH engines — Spark sorts
    NULLS FIRST, DuckDB NULLS LAST, and a NULL must not hold a k-min
    slot)."""
    return F.conv(F.substring(F.md5(v.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_hash_sql(expr: str) -> str:
    """The identical hash in DuckDB SQL."""
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"


def kmv_estimate(nk: F.Column, kth: F.Column, k: int) -> F.Column:
    """(k-1)/u_(k) scaled to the 60-bit hash space; exact count below k."""
    return F.when(nk < k, nk.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(2.0**60) / kth.cast("double")
    )


def kmv_estimate_sql(cnt: str, kth: str, k: int) -> str:
    """The identical estimator in DuckDB SQL."""
    return (
        f"CASE WHEN {cnt} < {k} THEN CAST({cnt} AS DOUBLE) "
        f"ELSE {k - 1} * pow(2.0, 60) / CAST({kth} AS DOUBLE) END"
    )


def kmv_estimate_py(n: int, kth: int, k: int) -> float:
    """The identical estimator in plain Python (streaming state updater)."""
    return float(n) if n < k else (k - 1) * 2.0**60 / float(kth)
