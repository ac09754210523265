"""Similarity search over embedding columns (SURVEY §7.7).

- :func:`topk_bruteforce` — exact cosine top-k: the correctness baseline.
  Queries are broadcast against a corpus scan; ranking is a window over the
  query id. At 100 TB the corpus scan is embarrassingly parallel and the
  shuffle is bounded by |queries|·|corpus-partition topk|.
- :func:`topk_lsh` — the scale path: random-hyperplane LSH signatures
  (sign-of-projection, Charikar '02) bucket the corpus; candidates come
  from an equi-join on the signature (optionally with multi-probe on
  1-bit-flipped signatures), then exact re-ranking. Hyperplanes are
  fixed-seed PRNG plan-time constants, so signatures are deterministic and
  reproducible with no stored model.

All Column-expression math (fold-based dot products) — no UDFs, no
driver-side vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ibc_spark.ext.dedup import cosine


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query (self-matches excluded).
    Deterministic ordering: (cosine desc, neighbor id asc)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(q, on=F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos_sim"))
    )


def lsh_hyperplanes(bits: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic hyperplane matrix (bits × dim) in [-0.5, 0.5), built
    ONCE at plan-construction time (PCG64 with a fixed seed — reproducible,
    model-free). Plan-time constants keep the per-row work at ``bits`` dot
    products instead of re-deriving ``bits·dim`` hash values per row."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.uniform(-0.5, 0.5, size=(bits, dim)).tolist()


def lsh_signature(vec: Column, *, bits: int = 12, dim: int = 64, seed: int = 7) -> Column:
    """Random-hyperplane signature: bit i = sign(v · w_i) (Charikar '02).
    Hyperplanes are embedded as literal arrays, so Catalyst constant-folds
    them and each row pays only the fold-based dot products."""
    planes = lsh_hyperplanes(bits, dim, seed)
    dv = F.transform(vec, lambda x: x.cast("double"))
    out = F.lit(0).cast("long")
    for i in range(bits):  # bit index is a Python int: shiftable, unrollable
        w = F.array(*[F.lit(float(x)) for x in planes[i]])
        proj = F.aggregate(
            F.zip_with(dv, w, lambda x, wt: x * wt), F.lit(0.0), lambda acc, x: acc + x
        )
        out = out + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 5,
    bits: int = 4,
    tables: int = 8,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE hyperplane LSH: ``tables``
    independent signatures of ``bits`` bits each; a candidate shares any
    table's bucket with the query (with ``multiprobe``, also any bucket at
    Hamming distance 1). Candidates are deduped, then exactly re-ranked.

    Recall math (why multi-table): with per-hyperplane agreement p =
    1 − θ/π, one b-bit table recalls p^b; L tables recall 1−(1−p^b)^L.
    For coarse neighbors (p≈0.6 — the hard case) 4×8 with multiprobe gives
    ~0.9 recall where a single 12-bit table gives ~0. Bucket-join cost
    scales with L·|corpus|/2^b per query — still a bucket equi-join, never
    a cross join.
    """
    c_tabs = F.array(
        *[
            F.struct(
                F.lit(t).alias("tab"),
                lsh_signature(F.col(vec_col), bits=bits, dim=dim, seed=7 + t).alias(
                    "bucket"
                ),
            )
            for t in range(tables)
        ]
    )
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            F.explode(c_tabs).alias("tb"),
        )
        .select("neighbor_id", "c_vec", "tb.tab", "tb.bucket")
    )

    def q_probes(t: int) -> Column:
        sig = lsh_signature(F.col(vec_col), bits=bits, dim=dim, seed=7 + t)
        buckets = [sig]
        if multiprobe:
            buckets += [sig.bitwiseXOR(F.lit(1 << i)) for i in range(bits)]
        return F.array(
            *[F.struct(F.lit(t).alias("tab"), b.alias("bucket")) for b in buckets]
        )

    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(F.flatten(F.array(*[q_probes(t) for t in range(tables)]))).alias(
                "tb"
            ),
        )
        .select("query_id", "q_vec", "tb.tab", "tb.bucket")
    )

    cands = (
        c.join(F.broadcast(q), on=["tab", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos_sim"))
    )
