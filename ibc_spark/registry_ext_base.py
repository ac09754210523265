"""Shared fragments of the split extension registry: the DuckDB
list-lambda dialect SQL pieces (_TOKS/_SHINGLES/_FOLD_SUM_D/_cos_sql)
and the planted-duplicate embedding fixtures every similarity/dedup
family composes. LEAF module — imports only engine/ext code, never a
registry entry module, so any family module can pull fragments at
decoration time without a cycle (the registry_core pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ibc_spark.ext import dedup, similarity  # noqa: F401
from ibc_spark.io_.sources import read_table

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(len(toks)-2,1)+1),"
    " i -> array_to_string(list_slice(toks, i, i+2), ' ')))"
)
_FOLD_SUM_D = "list_reduce(list_prepend(CAST(0 AS DOUBLE), {}), (acc,x) -> acc + x)"


def _cos_sql(a: str, b: str) -> str:
    dot = _FOLD_SUM_D.format(f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))")
    na = _FOLD_SUM_D.format(f"list_transform({a}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))")
    nb = _FOLD_SUM_D.format(f"list_transform({b}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))")
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


# Planted near-duplicates for the LSH dedup entry: the synthetic embeddings
# have NO natural pairs above cosine 0.51 (measured at sf0.01/sf0.1), so a
# high-threshold entry on the raw table would be trivially empty. Every 10th
# vector gets a near-copy (element 0 scaled ×1.5 in double, cast back to
# float — cosine to its original is ≥ 0.98 for any vector, while copies stay
# ≤ ~0.51 from everything else). The float32 round-trip makes the augmented
# table bit-identical across engines.
_AUG_SQL = """
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_concat([CAST(CAST(embedding[1] AS DOUBLE) * 1.5 AS FLOAT)],
                         embedding[2:])
      FROM embeddings WHERE vec_id % 10 = 0
"""


def _augmented_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array((F.col("embedding")[0].cast("double") * 1.5).cast("float")),
            F.slice(F.col("embedding"), 2, F.size(F.col("embedding")) - 1),
        ).alias("embedding"),
    )
    return e.unionByName(planted)


# Planted-dup fixture INSIDE the real doc-id space (unlike _AUG_SQL, whose
# planted ids are out-of-corpus): every vec_id ≡ 0 (mod 10) takes its
# successor's embedding, creating exact-dup pairs (10k, 10k+1) whose cluster
# drops map back onto `documents`. Lets the corpus-level dedup entries run
# the UNBLOCKED banded-LSH candidate path (threshold 0.9, the regime LSH is
# built for) instead of blocked all-pairs, and still be oracle-exact: cos=1
# pairs hit every band with probability 1, and no natural pair reaches 0.9
# at oracle SF (checked: 0 pairs ≥ 0.85 at sf0.01).
_PLANT_SQL = """
      SELECT e.vec_id,
             CASE WHEN e.vec_id % 10 = 0 AND p.embedding IS NOT NULL
                  THEN p.embedding ELSE e.embedding END AS embedding
      FROM embeddings e LEFT JOIN embeddings p ON p.vec_id = e.vec_id + 1
"""

_PLANTED_PAIRS = f"""
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM emb a JOIN emb b ON a.vec_id < b.vec_id
      WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.9
"""


def _planted_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_PLANT_SQL``: successor-embedding override via an
    equi-self-join on vec_id (no global-sort window)."""
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    succ = e.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("succ_emb")
    )
    return e.join(succ, on="vec_id", how="left").select(
        "vec_id",
        F.when(
            (F.col("vec_id") % 10 == 0) & F.col("succ_emb").isNotNull(),
            F.col("succ_emb"),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )


def _planted_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed candidate generation for the corpus-level entries: banded
    hyperplane LSH + exact cosine verify over the planted-dup table — the
    same scale path `dedup_embedding_lsh` proves, nothing quadratic."""
    return dedup.embedding_lsh_pairs(
        _planted_embeddings(spark, sf_dir),
        id_col="vec_id",
        vec_col="embedding",
        threshold=0.9,
        # adaptive (r, B): (8, 32) at oracle SF, grows with log(n) so the
        # band-signature space never saturates (r8 full-registry scan)
    )


