"""Similarity-search registry entries (split from registry_ext, round 8
— VERDICT r7 #7): brute-force/LSH/IVF ANN top-k with their portable
oracle faces, range search, kNN graphs, int8 quantization. Entry names
and oracles unchanged.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ibc_spark.ext import dedup, multimodal, similarity, text  # noqa: F401
from ibc_spark.io_.sources import read_table  # noqa: F401
from ibc_spark.registry_core import query  # noqa: F401
# registers bm25_keyword_search, whose ORACLES entry _hybrid_rrf_oracle()
# composes at decoration time — without this, importing this family module
# standalone dies with KeyError (review r8)
from ibc_spark import registry_ext_text as _dep_registry_ext_text  # noqa: F401
from ibc_spark.registry_ext_base import (  # noqa: F401
    _AUG_SQL,
    _FOLD_SUM_D,
    _PLANT_SQL,
    _PLANTED_PAIRS,
    _SHINGLES,
    _TOKS,
    _augmented_embeddings,
    _cos_sql,
    _planted_embeddings,
    _planted_lsh_pairs,
)

# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id, {_cos_sql('qv', 'cv')} AS cos
      FROM c JOIN q ON query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank,
           round(cos, 4) AS cos_sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 query vectors — the ANN correctness
    baseline (broadcast queries × corpus scan + per-query window)."""
    e = read_table(spark, sf_dir, "embeddings")
    return similarity.topk_bruteforce(
        e, e.where(F.col("vec_id") < 10), id_col="vec_id", vec_col="embedding", k=5
    )


def _ann_attest(gold: DataFrame, approx: DataFrame, *, k: int, floor: float) -> DataFrame:
    """Reduce an approximate top-k result against its exact gold arm to a
    single deterministic attestation row the DuckDB oracle can check:
    ``n_queries``/``n_gold`` are data-derived (the oracle recomputes them),
    ``recall_ok``/``k_cap_ok`` are invariants that hold by the operator's
    contract (recall floor pinned by the same pytest bound; per-query
    output bounded by k). One full-outer join + two aggregations — no
    scalar cross joins, so no new BNLJ surface beyond the arms' own."""
    g = gold.select("query_id", "neighbor_id", F.lit(1).alias("in_gold"))
    a = approx.select("query_id", "neighbor_id", F.lit(1).alias("in_approx"))
    per_q = (
        g.join(a, on=["query_id", "neighbor_id"], how="full")
        .groupBy("query_id")
        .agg(
            F.sum("in_gold").alias("gold_cnt"),
            F.sum(F.col("in_gold") * F.col("in_approx")).alias("hit_cnt"),
            F.sum("in_approx").alias("approx_cnt"),
        )
    )
    # Every boolean is coalesced to its vacuous-truth value and n_gold to 0
    # so a degenerate/empty corpus (first scheduled run, fully-filtered
    # input) yields the same constant row the oracle emits instead of NULLs
    # (sum/max over zero rows is NULL; NULL >= x is NULL, not a boolean).
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.coalesce(F.sum(F.coalesce("gold_cnt", F.lit(0))), F.lit(0)).alias("n_gold"),
        F.coalesce(
            F.sum(F.coalesce("hit_cnt", F.lit(0)))
            / F.sum(F.coalesce("gold_cnt", F.lit(0)))
            >= F.lit(floor),
            F.lit(True),
        ).alias("recall_ok"),
        F.coalesce(
            F.max(F.coalesce("approx_cnt", F.lit(0))) <= F.lit(k), F.lit(True)
        ).alias("k_cap_ok"),
    )


_ANN_ATTEST_ORACLE = """
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(5 * count(*) AS BIGINT) AS n_gold,
           true AS recall_ok,
           true AS k_cap_ok
    FROM embeddings WHERE vec_id < 10
    """


@query("ann_topk_lsh", oracle=_ANN_ATTEST_ORACLE)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION-FACE ATTESTATION of the PRNG-hyperplane LSH top-k
    (VERDICT r8 #2 option (a) — formerly rows-only): runs the full
    multi-probe LSH search (``similarity.topk_lsh``, the user API — 8
    tables × 4 bits, Hamming≤1 probes, exact re-rank) AND the exact
    brute-force gold arm in the same job, then emits one deterministic
    invariant row: n_queries/n_gold (data-derived — the oracle recomputes
    them from the table), recall ≥ 0.3 vs gold (the same floor
    ``test_lsh_topk_recall_vs_bruteforce`` pins — deterministic on fixed
    data because the hyperplanes are fixed-seed), and the per-query ≤ k
    output cap. The full neighbor-list output stays hash-attested through
    ``ann_topk_lsh_portable`` (identical machinery, md5 planes); this
    entry is the driver's proof that the PRODUCTION spelling runs and
    meets its quality contract. At 100 TB this attestation shape runs on
    a held-out query sample next to the serving index — the gold arm is
    O(sample·corpus) only over the audit slice."""
    e = read_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    gold = similarity.topk_bruteforce(e, q, id_col="vec_id", vec_col="embedding", k=5)
    approx = similarity.topk_lsh(e, q, id_col="vec_id", vec_col="embedding", k=5)
    return _ann_attest(gold, approx, k=5, floor=0.3)


@query(
    "ann_topk_lsh_portable",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    planes AS (
      SELECT j, d,
             CAST(CAST(('0x' || substr(md5('p' || CAST(j AS VARCHAR) || ',' || CAST(d AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
               / pow(2.0, 60) - 0.5 AS w
      FROM range(0, 32) tj(j), range(0, 64) td(d)
    ),
    proj AS (
      SELECT e.vec_id, p.j,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list(e.v[p.d + 1] * p.w ORDER BY p.d)),
                         (a, x) -> a + x) AS s
      FROM emb e, planes p
      GROUP BY e.vec_id, p.j
    ),
    sig AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(j AS INT)
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sg
      FROM proj GROUP BY vec_id
    ),
    cb AS (
      SELECT g.vec_id AS neighbor_id, t.t AS tab,
             (g.sg >> CAST(4 * t.t AS INT)) & 15 AS bucket
      FROM sig g, range(0, 8) t(t)
    ),
    qp AS (
      SELECT g.vec_id AS query_id, t.t AS tab,
             CASE WHEN pr.i = 0 THEN (g.sg >> CAST(4 * t.t AS INT)) & 15
                  ELSE xor((g.sg >> CAST(4 * t.t AS INT)) & 15,
                           CAST(1 AS BIGINT) << CAST(pr.i - 1 AS INT)) END AS bucket
      FROM sig g, range(0, 8) t(t), range(0, 5) pr(i)
      WHERE g.vec_id < 10
    ),
    cand AS (
      SELECT DISTINCT q.query_id, c.neighbor_id
      FROM qp q JOIN cb c ON q.tab = c.tab AND q.bucket = c.bucket
      WHERE q.query_id <> c.neighbor_id
    ),
    scored AS (
      SELECT ca.query_id, ca.neighbor_id,
             {_cos_sql('qe.embedding', 'ne.embedding')} AS cos
      FROM cand ca
      JOIN embeddings qe ON qe.vec_id = ca.query_id
      JOIN embeddings ne ON ne.vec_id = ca.neighbor_id
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank,
           round(cos, 4) AS cos_sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5
    """,
)
def ann_topk_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-ATTESTED face of the multi-table LSH ANN search: identical
    bucketing machinery to ``ann_topk_lsh`` (8 tables × 4 bits, Hamming≤1
    multi-probe, dedup, exact re-rank) but the hyperplanes derive from
    md5 (the Bloom/KMV md5-uniform trick) and each projection accumulates
    as a STRICT LEFT FOLD (`similarity.lsh_signature_portable`), so the
    ENTIRE pipeline — planes, sign bits, buckets, probes, candidate set,
    re-rank, ranking — is replayed bit-for-bit by the DuckDB oracle. The
    PRNG-planes production variant stays registered (`ann_topk_lsh`,
    now an oracled invariant-attestation surface: recall-vs-gold floor +
    output-shape invariants — an oracle replaying an approximation
    cannot prove recall, so this entry instead proves the MACHINERY end
    to end externally, the same sibling split as dedup_simhash /
    dedup_simhash_verified)."""
    e = read_table(spark, sf_dir, "embeddings")
    return similarity.topk_lsh(
        e,
        e.where(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        signature="md5",
    )


def _ivf_portable_oracle() -> str:
    from ibc_spark.ext.foldspec import (
        _FOLD_B,
        _FOLD_BUCKETS,
        _FOLD_PARTIAL,
        _KM_DIM,
        _KM_DIST,
        _km_assign_sql,
    )

    qdist = _KM_DIST.format(a="e.v", b="c.cv")
    return f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    trn AS (SELECT * FROM emb WHERE vec_id % 5 = 0),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM trn ORDER BY vec_id LIMIT 16),
    {_km_assign_sql("c0", "a1", src="trn")},
    p1 AS (
      SELECT cid, i AS pos, vec_id // {_FOLD_B} AS bkt,
             {_FOLD_PARTIAL.format(val="v[i]")} AS psum, count(*) AS pn
      FROM a1, generate_series(1, {_KM_DIM}) t(i)
      GROUP BY cid, pos, bkt
    ),
    m1 AS (
      SELECT cid, pos,
             {_FOLD_BUCKETS.format(val="psum")} / CAST(sum(pn) AS BIGINT) AS mu
      FROM p1 GROUP BY cid, pos
    ),
    c1 AS (SELECT cid, list(mu ORDER BY pos) AS cv FROM m1 GROUP BY cid),
    {_km_assign_sql("c1", "a2")},
    qd AS (
      SELECT e.vec_id AS query_id, c.cid, {qdist} AS dist
      FROM emb e, c1 c
      WHERE e.vec_id < 10
    ),
    qp AS (
      SELECT query_id, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, cid) AS rn
        FROM qd
      ) WHERE rn <= 6
    ),
    cand AS (
      SELECT q.query_id, a.vec_id AS neighbor_id
      FROM qp q JOIN a2 a ON a.cid = q.cid
      WHERE a.vec_id <> q.query_id
    ),
    scored AS (
      SELECT ca.query_id, ca.neighbor_id,
             {_cos_sql('qe.embedding', 'ne.embedding')} AS cos
      FROM cand ca
      JOIN embeddings qe ON qe.vec_id = ca.query_id
      JOIN embeddings ne ON ne.vec_id = ca.neighbor_id
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank,
           round(cos, 4) AS cos_sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 5
    """


@query("ann_topk_ivf_portable", oracle=_ivf_portable_oracle())
def ann_topk_ivf_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-ATTESTED face of the IVF ANN search, completing the family
    (brute force, portable-LSH, and now portable-IVF all under the full
    hash-check): the coarse quantizer is the repo's fold-exact Lloyd
    trainer (`km_train`: 16 centroids, one update, trained on the
    vec_id % 5 hash-sample with bounded two-level folds), corpus rows
    land in their nearest cell by the same deterministic L2 argmin the
    k-means entries use, each query probes its 6 nearest cells, and
    candidates re-rank by exact cosine — every stage replayed bit-for-bit
    in DuckDB. The numpy-trained production variant stays registered
    (`ann_topk_ivf`, now an oracled invariant-attestation surface:
    recall floor + full-probe==exact as booleans): this oracle attests
    the MACHINERY, that one attests the quality contract."""
    from ibc_spark.ext.persistreg import persist_tracked
    from ibc_spark.registry_lakehouse import km_assign, km_train

    e = read_table(spark, sf_dir, "embeddings")
    emb = e.select(
        "vec_id",
        "embedding",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # the 16-row centroid frame feeds BOTH the corpus assignment and the
    # query-probe ranking — persist it or the whole Lloyd training chain
    # re-executes per consumer (measured 3.6 s -> 2.7 s at sf0.1)
    cents = persist_tracked(km_train(emb.select("vec_id", "v"), k=16, sample_mod=5))
    cells = km_assign(emb.select("vec_id", "v"), cents).select(
        F.col("vec_id").alias("neighbor_id"), F.col("cid").alias("cell")
    )
    corpus = cells.join(
        e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")),
        "neighbor_id",
    )
    qd = (
        emb.where(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("query_id"), "v", "embedding")
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            F.col("embedding").alias("q_vec"),
            "cid",
            F.aggregate(
                F.zip_with("v", "cv", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("dist"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy("dist", "cid")
    qp = (
        qd.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= 6)
        .select("query_id", "q_vec", F.col("cid").alias("cell"))
    )
    cands = corpus.join(F.broadcast(qp), "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cands.withColumn(
        "cos", dedup.cosine_fast(F.col("q_vec"), F.col("c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos_sim"))
    )


@query(
    "ann_topk_ivf",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(5 * count(*) AS BIGINT) AS n_gold,
           true AS recall_ok,
           true AS k_cap_ok,
           true AS full_probe_matches_exact_ok
    FROM embeddings WHERE vec_id < 10
    """,
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION-FACE ATTESTATION of the IVF top-k (VERDICT r8 #2 option
    (a) — formerly rows-only): runs the numpy-sample-trained IVF search
    (``similarity.topk_ivf``, the user API — 16-cell coarse quantizer,
    nprobe=6, exact re-rank) against the brute-force gold arm and emits
    one deterministic invariant row: data-derived n_queries/n_gold,
    recall ≥ 0.3 at nprobe=6 (the ``test_ivf_topk_recall_vs_bruteforce``
    floor — deterministic on fixed data, fixed-seed training sample),
    the per-query ≤ k cap, and the IVF identity check: probing ALL 16
    cells must reproduce the exact brute-force ranking EXACTLY (full
    probe ⇒ candidate set = corpus ⇒ the re-rank IS brute force — any
    divergence means the cell assignment dropped or duplicated a vector).
    The fold-exact trained face stays fully hash-attested through
    ``ann_topk_ivf_portable``; this entry proves the production spelling
    runs and meets its contract."""
    from ibc_spark.ext.persistreg import persist_tracked

    e = read_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    # the gold frame feeds BOTH the recall attest and the full-probe
    # identity join — persist or the brute-force scan runs twice
    gold = persist_tracked(
        similarity.topk_bruteforce(e, q, id_col="vec_id", vec_col="embedding", k=5)
    )
    approx = similarity.topk_ivf(
        e, q, id_col="vec_id", vec_col="embedding", k=5, n_centroids=16, nprobe=6
    )
    attest = _ann_attest(gold, approx, k=5, floor=0.3)
    full = similarity.topk_ivf(
        e, q, id_col="vec_id", vec_col="embedding", k=5, n_centroids=16, nprobe=16
    )
    ident = (
        gold.select("query_id", "neighbor_id", "rank")
        .withColumn("g", F.lit(1))
        .join(
            full.select("query_id", "neighbor_id", "rank").withColumn("f", F.lit(1)),
            on=["query_id", "neighbor_id", "rank"],
            how="full",
        )
        .agg(
            F.coalesce(
                F.count(F.lit(1)) == F.sum(F.col("g") * F.col("f")), F.lit(True)
            ).alias("full_probe_matches_exact_ok")
        )
    )
    return attest.crossJoin(ident)


@query(
    "ann_range_search",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT a.vec_id, round({_cos_sql('a.embedding', 'q.qv')}, 4) AS cos_sim
    FROM embeddings a CROSS JOIN q
    WHERE {_cos_sql('a.embedding', 'q.qv')} >= 0.2 AND a.vec_id <> 0
    """,
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE similarity search: every vector within cosine radius (>= 0.2)
    of a query vector — the fixed-radius companion to top-k retrieval
    (radius queries power dedup-at-ingest and recall-bounded filtering).

    Plan: the one-row query vector broadcasts onto a single corpus scan;
    scoring is one vectorized Arrow kernel pass; the radius filter
    prunes before any shuffle (there is none — output is the hit list).
    Brute force IS the scale baseline here; the LSH/IVF variants
    (`ann_topk_lsh`/`ann_topk_ivf`) show the bucketed path when scans
    dominate."""
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = e.join(F.broadcast(q)).withColumn(
        "cos", dedup.cosine_fast(F.col("embedding"), F.col("qv"))
    )
    return (
        scored.where((F.col("cos") >= 0.2) & (F.col("vec_id") != 0))
        .select("vec_id", F.round("cos", 4).alias("cos_sim"))
    )


@query(
    "knn_graph_topk",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             {_cos_sql('a.embedding', 'b.embedding')} AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT src, dst, round(cos, 4) AS cos_sim,
             row_number() OVER (PARTITION BY src
                                ORDER BY cos DESC, dst) AS rk
      FROM pairs
    )
    SELECT src, dst, cos_sim, rk FROM ranked WHERE rk <= 3
    """,
)
def knn_graph_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN GRAPH construction (k=3): every vector's top-3 cosine
    neighbors — the building block SemDeDup-style semantic clustering,
    graph-based ANN indexes (HNSW layers), and diversity sampling all
    start from.

    Plan: BLOCKED GEMM (`ext.similarity.knn_graph_blocked`) — the naive
    pair explosion moves O(n²·dim) vector bytes through Arrow (measured
    13 s at sf0.1 where the blocked form takes ~1 s); blocks cross-join
    so each task scores one block pair with a single BLAS matmul, and a
    per-src window merges the per-block top-k partials. Exact — flops
    stay O(n²·dim), only the data movement shrinks. Ties broken by
    neighbor id so the graph is deterministic in both engines; at 100 TB
    the pair source swaps to LSH/IVF candidates, same final window."""
    from ibc_spark.ext.similarity import knn_graph_blocked

    e = read_table(spark, sf_dir, "embeddings")
    return knn_graph_blocked(e, id_col="vec_id", vec_col="embedding", k=3)


@query(
    "knn_graph_lsh",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(3 * count(*) AS BIGINT) AS n_exact_edges,
           true AS recall_ok,
           true AS no_self_edges_ok
    FROM embeddings
    """,
)
def knn_graph_lsh_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION-FACE ATTESTATION of the LSH-pruned k-NN graph (VERDICT
    r8 #2 option (a) — formerly rows-only): builds BOTH graphs — the
    LSH-pruned blocked GEMM (``similarity.knn_graph_lsh``, the user API:
    per-table (bucket) cells at corpus-adaptive width — derived bits
    equal the historical 4 at oracle SFs — Hamming≤1 probe GEMM,
    multi-table max-cos merge) and the exact blocked-GEMM gold
    (``knn_graph_blocked``, the machinery ``knn_graph_topk``
    hash-attests) — and emits one
    deterministic invariant row: n_nodes and n_exact_edges are
    data-derived (every node has exactly min(k, n−1)=3 exact neighbors,
    so the oracle recomputes 3·n from the table), edge recall ≥ 0.9 (the
    ``test_knn_graph_lsh_recall_vs_exact`` floor — deterministic on fixed
    data, fixed-seed planes), and the no-self-edge invariant. The
    md5-planes sibling ``knn_graph_lsh_portable`` keeps the full
    edge-list hash attestation; this entry proves the PRNG production
    spelling runs and meets its contract on the same snapshot.

    GOLD-ARM PRICING (round 10, the ``eval_dedup_metrics`` audit-slice
    pattern): the exact arm runs only for SRC nodes in a deterministic
    ``vec_id % m == 0`` sample (``adaptive_sample_mod`` — m == 1 at every
    oracle SF, so driver-SF output and oracle SQL are unchanged; beyond,
    m grows so the sample stays ~2048 queries and the exact arm costs
    O(sample·n·dim) instead of O(n²·dim) — queries-vs-corpus blocked
    GEMM, the approx arm filtered to the same src sample). The modulus
    is the documented price dial at 100 TB. One ``count()`` feeds the
    modulus AND both arms' adaptive parameters AND n_nodes (ADVICE r9:
    no per-operator re-count)."""
    from ibc_spark.ext.similarity import (
        adaptive_sample_mod,
        knn_graph_blocked,
        knn_graph_lsh,
    )

    e = read_table(spark, sf_dir, "embeddings")
    n = e.count()
    m = adaptive_sample_mod(n)
    sample = e.where(F.col("vec_id") % m == 0) if m > 1 else None
    exact = knn_graph_blocked(
        e, id_col="vec_id", vec_col="embedding", k=3, n_rows=n, queries=sample
    )
    approx = knn_graph_lsh(
        e, id_col="vec_id", vec_col="embedding", k=3, tables=8, n_rows=n
    )
    if m > 1:
        approx = approx.where(F.col("src") % m == 0)
    edges = (
        exact.select("src", "dst", F.lit(1).alias("ex"))
        .join(
            approx.select("src", "dst", F.lit(1).alias("ap")),
            on=["src", "dst"],
            how="full",
        )
        .agg(
            F.coalesce(F.sum("ex"), F.lit(0)).alias("n_exact_edges"),
            # coalesce to vacuous truth: on an empty corpus sum over zero
            # rows is NULL and NULL >= 0.9 is NULL, diverging from the
            # oracle's constant true (ADVICE r9)
            F.coalesce(
                F.sum(F.col("ex") * F.col("ap")) / F.sum("ex") >= F.lit(0.9),
                F.lit(True),
            ).alias("recall_ok"),
            (
                F.coalesce(F.sum(F.when(F.col("src") == F.col("dst"), 1)), F.lit(0))
                == 0
            ).alias("no_self_edges_ok"),
        )
    )
    # n comes from the same count that sized the adaptive parameters —
    # data-derived, and one crossJoin fewer on the BNLJ allowlist
    return edges.select(
        F.lit(n).cast("long").alias("n_nodes"),
        "n_exact_edges",
        "recall_ok",
        "no_self_edges_ok",
    )


@query(
    "knn_graph_lsh_portable",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    planes AS (
      SELECT j, d,
             CAST(CAST(('0x' || substr(md5('p' || CAST(j AS VARCHAR) || ',' || CAST(d AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
               / pow(2.0, 60) - 0.5 AS w
      FROM range(0, 32) tj(j), range(0, 64) td(d)
    ),
    proj AS (
      SELECT e.vec_id, p.j,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list(e.v[p.d + 1] * p.w ORDER BY p.d)),
                         (a, x) -> a + x) AS s
      FROM emb e, planes p
      GROUP BY e.vec_id, p.j
    ),
    sig AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(j AS INT)
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sg
      FROM proj GROUP BY vec_id
    ),
    cells AS (
      SELECT g.vec_id, t.t AS tab,
             (g.sg >> CAST(4 * t.t AS INT)) & 15 AS bucket
      FROM sig g, range(0, 8) t(t)
    ),
    probes AS (
      SELECT c.vec_id, c.tab,
             CASE WHEN pr.i = 0 THEN c.bucket
                  ELSE xor(c.bucket, CAST(1 AS BIGINT) << CAST(pr.i - 1 AS INT)) END AS bucket
      FROM cells c, range(0, 5) pr(i)
    ),
    cand AS (
      SELECT DISTINCT p.vec_id AS src, c.vec_id AS dst
      FROM probes p JOIN cells c ON p.tab = c.tab AND p.bucket = c.bucket
      WHERE p.vec_id <> c.vec_id
    ),
    scored AS (
      SELECT ca.src, ca.dst, {_cos_sql('a.embedding', 'b.embedding')} AS cos
      FROM cand ca
      JOIN embeddings a ON a.vec_id = ca.src
      JOIN embeddings b ON b.vec_id = ca.dst
    )
    SELECT src, dst, round(cos, 4) AS cos_sim,
           CAST(row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS INT) AS rk
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) <= 3
    """,
)
def knn_graph_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-ATTESTED face of the LSH-pruned k-NN graph, completing the
    probabilistic family's attested-machinery siblings (portable-LSH and
    portable-IVF cover the search entries; this covers the graph
    builder): md5-derived hyperplanes with strict left-fold projections
    feed the SAME packed-cell blocked-GEMM pipeline — cells, Hamming≤1
    probes, per-block top-k partials, multi-table max-cos merge, per-src
    ranking — and DuckDB replays the candidate structure and the ranked
    edges exactly (the oracle scores ALL candidates; the partial top-k
    is lossless for the final per-src top-3, so the results coincide).
    The PRNG production entry keeps the recall≥0.9 pytest vs the exact
    graph."""
    from ibc_spark.ext.similarity import knn_graph_lsh

    e = read_table(spark, sf_dir, "embeddings")
    return knn_graph_lsh(
        e, id_col="vec_id", vec_col="embedding", k=3, tables=8,
        signature="md5",
    )


# ---------------------------------------------------------------------------
# Round 6 additions: embedding quantization, bigram PMI, window navigation
# ---------------------------------------------------------------------------


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-12) AS mx
      FROM embeddings
    ), qq AS (
      SELECT vec_id, embedding, mx,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx + 0.5) AS BIGINT)) AS qv
      FROM s
    )
    SELECT vec_id, round(mx, 6) AS scale,
           array_to_string(qv, ',') AS quantized,
           round(list_max(list_transform(list_zip(embedding, qv),
                 p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * mx / 127.0))), 6) AS max_abs_err
    FROM qq
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector INT8 quantization of the embedding column —
    the 4x memory/IO shrink an ANN index wants before serving 100 TB of
    vectors (FAISS SQ8-style): scale = max|x| (clamped away from 0 for
    zero vectors), q_i = floor(127·x_i/scale + 0.5), plus the max
    dequantization error as a per-row quality audit.

    All pure Column expressions over array lambdas (transform/zip_with) —
    zero shuffle, whole-stage codegen, embarrassingly parallel. floor(+0.5)
    rather than round() because HALF_UP vs banker's rounding differs
    across engines while floor is IEEE-exact everywhere; the quantized
    array is emitted as a joined string so the hash is representation-
    agnostic (registry convention, see `scalar_split_trim_lower`)."""
    e = read_table(spark, sf_dir, "embeddings")
    mx = F.greatest(
        F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))),
        F.lit(1e-12),
    )
    with_mx = e.select("vec_id", "embedding", mx.alias("mx"))
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(127.0) / F.col("mx") + F.lit(0.5)).cast("long"),
    )
    with_q = with_mx.select("vec_id", "embedding", "mx", qv.alias("qv"))
    err = F.array_max(
        F.zip_with(
            F.col("embedding"),
            F.col("qv"),
            lambda x, q: F.abs(x.cast("double") - q.cast("double") * F.col("mx") / F.lit(127.0)),
        )
    )
    return with_q.select(
        "vec_id",
        F.round(F.col("mx"), 6).alias("scale"),
        F.array_join(F.transform(F.col("qv"), lambda v: v.cast("string")), ",").alias("quantized"),
        F.round(err, 6).alias("max_abs_err"),
    )




# ---------------------------------------------------------------------------
# Hybrid retrieval: lexical BM25 + dense cosine fused by Reciprocal Rank
# Fusion (Cormack et al., SIGIR'09: score = Σ_arms 1/(κ + rank), κ=60)
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_ARM_K = 20


def _hybrid_rrf_oracle() -> str:
    """Compose the hybrid oracle from the REGISTERED bm25 oracle (the
    lexical arm can never drift from the standalone entry) plus a dense
    cosine arm ranked against the vec_id=0 query vector."""
    from ibc_spark.registry_core import ORACLES

    bm25 = ORACLES["bm25_keyword_search"].strip()
    return f"""
    WITH lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
               AS rank_lex
      FROM ({bm25})
    ),
    dense0 AS (
      SELECT e.vec_id AS doc_id, {_cos_sql('q.qv', 'e.embedding')} AS cos
      FROM embeddings e,
           (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
      WHERE e.vec_id <> 0
    ),
    dense AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INT)
               AS rank_dense
      FROM dense0
      QUALIFY row_number() OVER (ORDER BY cos DESC, doc_id) <= {_RRF_ARM_K}
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
             l.rank_lex, d.rank_dense,
             COALESCE(1.0 / ({_RRF_K} + l.rank_lex), 0)
               + COALESCE(1.0 / ({_RRF_K} + d.rank_dense), 0) AS rrf
      FROM lex l FULL JOIN dense d ON l.doc_id = d.doc_id
    )
    SELECT doc_id, rank_lex, rank_dense, round(rrf, 6) AS rrf
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT 10
    """


@query("search_hybrid_rrf", oracle=_hybrid_rrf_oracle())
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-20 (the registered
    ``bm25_keyword_search`` entry, called directly so the arm cannot drift)
    + exact cosine dense top-20 against the vec_id=0 query embedding
    (``similarity.topk_bruteforce`` — the machinery proven by
    ``ann_topk_bruteforce``), fused by Reciprocal Rank Fusion
    (1/(60+rank), the rank-only fusion that needs no score calibration
    between arms) into a final top-10.

    Scale shape: each arm ends in its own bounded top-k
    (TakeOrderedAndProject / WindowGroupLimit) BEFORE fusion, so the
    full-outer fusion join sees two ≤20-row frames regardless of corpus
    size — at 100 TB the dense arm swaps to the LSH/IVF entries with the
    same (doc_id, rank) contract and the fusion plan is unchanged. RRF
    arithmetic is two exact 1/(60+r) doubles and one IEEE addition —
    bit-identical across engines, round(6) only defensive."""
    from ibc_spark.registry_core import QUERIES

    lex = QUERIES["bm25_keyword_search"](spark, sf_dir)
    wl = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    lex = lex.select(
        "doc_id", F.row_number().over(wl).cast("int").alias("rank_lex")
    )
    e = read_table(spark, sf_dir, "embeddings")
    dense = similarity.topk_bruteforce(
        e,
        e.where(F.col("vec_id") == 0),
        id_col="vec_id",
        vec_col="embedding",
        k=_RRF_ARM_K,
    ).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("int").alias("rank_dense"),
    )
    fused = lex.join(dense, on="doc_id", how="full").select(
        "doc_id",
        "rank_lex",
        "rank_dense",
        (
            F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("rank_dense")), F.lit(0.0))
        ).alias("rrf_raw"),
    )
    return (
        fused.orderBy(F.col("rrf_raw").desc(), F.col("doc_id"))
        .limit(10)
        .select(
            "doc_id", "rank_lex", "rank_dense", F.round("rrf_raw", 6).alias("rrf")
        )
    )


@query(
    "embedding_random_projection",
    oracle="""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    planes AS (
      SELECT j, d,
             CAST(CAST(('0x' || substr(md5('rp' || CAST(j AS VARCHAR) || ',' || CAST(d AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
               / pow(2.0, 60) - 0.5 AS w
      FROM range(0, 16) tj(j), range(0, 64) td(d)
    ),
    proj AS (
      SELECT e.vec_id, CAST(p.j AS INT) AS j,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list(e.v[p.d + 1] * p.w ORDER BY p.d)),
                         (a, x) -> a + x) * sqrt(12.0 / 16.0) AS s
      FROM emb e, planes p
      GROUP BY e.vec_id, p.j
    )
    SELECT vec_id, j, round(s, 6) AS comp
    FROM proj
    """,
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction 64 → 16 (the 4×
    shuffle-byte shrink a 100 TB pipeline applies before ANN indexing),
    via `similarity.random_projection_portable`: md5-derived planes in a
    namespace disjoint from the LSH family, strict left-fold dot products,
    one sqrt(12/16) variance-preserving scale — every component replayed
    bit-for-bit by the oracle. Emitted as (vec_id, j, comp) rows so the
    hash compares typed doubles, not array stringifications. Distance
    preservation (the JL guarantee) is pinned in pytest, machinery here."""
    e = read_table(spark, sf_dir, "embeddings")
    proj = e.select(
        "vec_id",
        similarity.random_projection_portable(
            F.col("embedding"), out_dim=16, dim=64
        ).alias("pv"),
    )
    return proj.select(
        "vec_id", F.posexplode("pv").alias("j", "comp_raw")
    ).select("vec_id", F.col("j").cast("int").alias("j"), F.round("comp_raw", 6).alias("comp"))


@query(
    "sample_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neg_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neg_id, {_cos_sql('qv', 'cv')} AS cos
      FROM c JOIN q ON query_id <> neg_id
    ),
    banded AS (
      SELECT query_id, neg_id, cos FROM scored
      WHERE cos >= 0.25 AND cos < 0.95
    )
    SELECT query_id, neg_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neg_id) AS INT) AS rank,
           round(cos, 4) AS cos_sim
    FROM banded
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neg_id) <= 5
    """,
)
def sample_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE mining for contrastive/retrieval training data: per
    query, the top-5 most-similar vectors INSIDE the band
    0.25 ≤ cos < 0.95 — similar enough to be informative negatives,
    capped below the near-duplicate threshold so no positive leaks into
    the negative set (the standard dense-retrieval curriculum, cf. ANCE/
    DPR hard-negative sampling). Machinery is the proven
    ``similarity.topk_bruteforce`` scoring shape with the band filter
    pushed BEFORE the per-query top-k window, so WindowGroupLimit bounds
    state to k rows per query over only in-band candidates; at 100 TB the
    scoring side swaps to the LSH/IVF candidate generation with the same
    (query_id, neg_id, cos) contract."""
    e = read_table(spark, sf_dir, "embeddings")
    return similarity.topk_bruteforce(
        e,
        e.where(F.col("vec_id") < 10),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
        band=(0.25, 0.95),
    ).select(
        "query_id",
        F.col("neighbor_id").alias("neg_id"),
        "rank",
        "cos_sim",
    )


def _eval_retrieval_oracle() -> str:
    """Composed from the REGISTERED gold (exact brute force) and system
    (md5-portable LSH) oracles, so the eval can never drift from the
    retrieval entries it measures."""
    from ibc_spark.registry_core import ORACLES

    gold = ORACLES["ann_topk_bruteforce"].strip()
    sys_ = ORACLES["ann_topk_lsh_portable"].strip()
    return f"""
    WITH gold AS (SELECT query_id, neighbor_id FROM ({gold})),
    sys AS (SELECT query_id, neighbor_id, rank FROM ({sys_})),
    hits AS (
      SELECT g.query_id, s.rank
      FROM gold g JOIN sys s
        ON g.query_id = s.query_id AND g.neighbor_id = s.neighbor_id
    ),
    per_q AS (
      SELECT query_id,
             CAST(count(*) AS BIGINT) AS n_hit,
             min(rank) AS first_rank
      FROM hits GROUP BY query_id
    ),
    qs AS (SELECT DISTINCT query_id FROM gold)
    SELECT q.query_id,
           COALESCE(p.n_hit, 0) AS n_hit,
           round(COALESCE(p.n_hit, 0) / 5.0, 6) AS recall_at_5,
           round(COALESCE(1.0 / p.first_rank, 0.0), 6) AS mrr
    FROM qs q LEFT JOIN per_q p USING (query_id)
    """


@query("eval_retrieval_metrics", oracle=_eval_retrieval_oracle())
def eval_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFLINE RETRIEVAL EVAL — the measurement operator a training-data
    pipeline runs before swapping an ANN index into production: per
    query, recall@5 and MRR of the md5-portable LSH retrieval
    (`ann_topk_lsh_portable`) against the exact brute-force gold
    (`ann_topk_bruteforce`). Both sides are CALLS to the registered
    entries and the oracle composes their registered SQL, so eval and
    system cannot drift apart (the `corpus_pipeline_funnel` composition
    pattern). Both arms end in bounded per-query top-k, so the eval join
    touches O(queries·k) rows regardless of corpus size — at 100 TB this
    runs on a held-out query sample against the production index with
    the same plan."""
    from ibc_spark.registry_core import QUERIES

    gold = QUERIES["ann_topk_bruteforce"](spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    sysr = QUERIES["ann_topk_lsh_portable"](spark, sf_dir).select(
        "query_id", "neighbor_id", "rank"
    )
    hits = gold.join(sysr, on=["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.min("rank").alias("first_rank"),
    )
    qs = gold.select("query_id").distinct()
    return qs.join(hits, on="query_id", how="left").select(
        "query_id",
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        F.round(F.coalesce("n_hit", F.lit(0)) / 5.0, 6).alias("recall_at_5"),
        F.round(F.coalesce(1.0 / F.col("first_rank"), F.lit(0.0)), 6).alias("mrr"),
    )


def _triplets_oracle() -> str:
    """Composed from the REGISTERED gold top-k and hard-negative oracles
    (the eval_retrieval_metrics composition pattern), so the triplet set
    can never drift from the entries that define positives and
    negatives."""
    from ibc_spark.registry_core import ORACLES

    gold = ORACLES["ann_topk_bruteforce"].strip()
    negs = ORACLES["sample_hard_negatives"].strip()
    return f"""
    WITH pos AS (
      SELECT query_id, neighbor_id AS pos_id, cos_sim AS pos_cos
      FROM ({gold}) WHERE rank = 1
    ),
    neg AS (SELECT query_id, neg_id, cos_sim AS neg_cos FROM ({negs}))
    SELECT p.query_id, p.pos_id, n.neg_id, p.pos_cos, n.neg_cos,
           round(p.pos_cos - n.neg_cos, 4) AS margin
    FROM pos p JOIN neg n ON p.query_id = n.query_id
    WHERE n.neg_id <> p.pos_id
    """


@query("sample_contrastive_triplets", oracle=_triplets_oracle())
def sample_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTRASTIVE TRAINING TRIPLETS (query, positive, hard negative) —
    the assembled training example a dense-retriever fine-tune consumes
    (DPR/ANCE shape): positive = the exact top-1 neighbor
    (`ann_topk_bruteforce` rank 1), negatives = the banded top-5
    (`sample_hard_negatives`), margin = pos_cos − neg_cos (the quantity
    a triplet loss drives up). Both arms are CALLS to the registered
    entries and the oracle composes their registered SQL, so triplets,
    eval, and mining can never drift apart. The positive is EXCLUDED from
    the negative set (the top-1 can land inside the negative band when
    its cosine is below the near-dup cap — caught by the invariant
    test). Each arm ends in bounded
    per-query top-k, so the assembly join touches O(queries·k) rows at
    any corpus size."""
    from ibc_spark.registry_core import QUERIES

    pos = (
        QUERIES["ann_topk_bruteforce"](spark, sf_dir)
        .where(F.col("rank") == 1)
        .select(
            "query_id",
            F.col("neighbor_id").alias("pos_id"),
            F.col("cos_sim").alias("pos_cos"),
        )
    )
    neg = QUERIES["sample_hard_negatives"](spark, sf_dir).select(
        "query_id", "neg_id", F.col("cos_sim").alias("neg_cos")
    )
    return pos.join(neg, on="query_id").where(
        F.col("neg_id") != F.col("pos_id")
    ).select(
        "query_id",
        "pos_id",
        "neg_id",
        "pos_cos",
        "neg_cos",
        F.round(F.col("pos_cos") - F.col("neg_cos"), 4).alias("margin"),
    )
