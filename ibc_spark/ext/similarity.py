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
- :func:`topk_ivf` — the other scale path: an IVF (inverted-file) index.
  A coarse quantizer (k-means trained on a BOUNDED fixed-seed sample, as
  FAISS does) partitions the corpus into cells; each query probes its
  ``nprobe`` nearest cells, candidates come from an equi-join on cell id,
  then exact re-ranking. Cell assignment is one Arrow-batched matmul.

Dense-vector math (signatures, cell assignment, pairwise scoring) runs as
Arrow-batched pandas UDFs — one numpy pass per batch; everything else
(bucketing, joins, ranking) is Column expressions. No per-row Python, no
driver-side vectors beyond the bounded IVF training sample.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ibc_spark.ext.dedup import cosine_fast


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 5,
    band: tuple[float, float] | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query (self-matches excluded).
    Deterministic ordering: (cosine desc, neighbor id asc). ``band``
    restricts candidates to lo ≤ cos < hi BEFORE the per-query top-k
    window (hard-negative mining's shape — WindowGroupLimit then bounds
    state over in-band candidates only)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(q, on=F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_fast(F.col("q_vec"), F.col("c_vec")))
    )
    if band is not None:
        lo, hi = band
        scored = scored.where((F.col("cos") >= lo) & (F.col("cos") < hi))
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
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.5, 0.5, size=(bits, dim)).tolist()


def lsh_signature(vec: Column, *, bits: int = 12, dim: int = 64, seed: int = 7) -> Column:
    """Random-hyperplane signature: bit i = sign(v · w_i) (Charikar '02),
    packed into one long.

    Implemented as an Arrow-batched pandas UDF doing a single numpy matmul
    per batch — the measured-fastest of three designs:

    1. per-bit unrolled Column folds: fast to run but the codegen unit
       grows with bits·dim (≈10 s of Janino compile at 32×64);
    2. data-driven ``transform``/``slice`` folds: tiny plan, but Catalyst
       does not constant-fold literals inside lambda bodies, so the weight
       array is rebuilt per row·bit (~5× slower end-to-end);
    3. this: vectorized (batch, dim) @ (dim, bits) sign+pack, ~ms per
       10k-row batch, zero compile cost, deterministic (fixed-seed
       hyperplanes baked into the closure).
    """
    planes = np.asarray(lsh_hyperplanes(bits, dim, seed))  # (bits, dim)
    powers = (1 << np.arange(bits)).astype(np.int64)

    @pandas_udf("long")
    def _sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        proj = mat @ planes.T  # (n, bits)
        return pd.Series(((proj > 0) * powers).sum(axis=1))

    return _sig(vec)


def lsh_hyperplanes_md5(bits: int, dim: int, prefix: str = "p") -> np.ndarray:
    """ENGINE-PORTABLE hyperplane matrix: w[j][d] = md5("{prefix}{j},{d}")'s
    first 60 bits as a double in [0,1) minus 0.5 — the same md5-uniform
    trick the Bloom/KMV entries use, so a SQL oracle regenerates the
    identical planes. float(h) first (then the exact power-of-two division)
    mirrors DuckDB's CAST(h AS DOUBLE)/pow(2,60) bit-for-bit. ``prefix``
    namespaces independent plane families (LSH keeps the original "p";
    other consumers must pick their own so adding planes never aliases)."""
    import hashlib

    return np.array(
        [
            [
                float(int(hashlib.md5(f"{prefix}{j},{d}".encode()).hexdigest()[:15], 16))
                / 2.0**60
                - 0.5
                for d in range(dim)
            ]
            for j in range(bits)
        ]
    )


def lsh_signature_portable(vec: Column, *, bits: int, dim: int = 64) -> Column:
    """Hyperplane signature with md5-derived planes and STRICT LEFT-FOLD
    projections: each bit's dot product accumulates in index order
    (``np.cumsum`` computes every prefix, so its last element IS the
    sequential left fold — bit-identical to the oracle's
    ``list_reduce(... ORDER BY d)``), making the sign decision — and thus
    the whole bucket structure — reproducible on any engine, not just
    ulp-close. Same Arrow-batched shape as :func:`lsh_signature`; the
    (n, bits, dim) product tensor bounds batch memory, fine for the
    32-bit signatures used here."""
    planes = lsh_hyperplanes_md5(bits, dim)  # (bits, dim)
    powers = (1 << np.arange(bits)).astype(np.int64)

    @pandas_udf("long")
    def _sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        prods = mat[:, None, :] * planes[None, :, :]  # (n, bits, dim)
        s = np.cumsum(prods, axis=2)[:, :, -1]  # strict left fold per bit
        return pd.Series(((s > 0) * powers).sum(axis=1))

    return _sig(vec)


def random_projection_portable(
    vec: Column, *, out_dim: int, dim: int = 64, prefix: str = "rp"
) -> Column:
    """Johnson–Lindenstrauss random projection to ``out_dim`` dimensions
    with md5-derived planes (namespace ``prefix`` — disjoint from the LSH
    family's "p") and STRICT LEFT-FOLD dot products, scaled by
    sqrt(12/out_dim) so squared distances are preserved in expectation
    (plane entries are uniform[-0.5, 0.5), variance 1/12). The fold order
    plus the single post-fold multiply make every output component
    bit-identical to a SQL replay — the attested face of the dim-reduction
    step a 100 TB pipeline runs before ANN indexing (4× fewer bytes into
    every downstream shuffle at 64→16).

    Same Arrow-batched shape as :func:`lsh_signature_portable`; the
    (n, out_dim, dim) product tensor bounds batch memory."""
    planes = lsh_hyperplanes_md5(out_dim, dim, prefix=prefix)
    scale = float(np.sqrt(12.0 / out_dim))

    @pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        prods = mat[:, None, :] * planes[None, :, :]  # (n, out_dim, dim)
        s = np.cumsum(prods, axis=2)[:, :, -1]  # strict left fold per j
        return pd.Series(list(s * scale))

    return _proj(vec)


def lsh_band_signatures(
    vec: Column, *, bits_per_band: int = 8, bands: int = 32, dim: int = 64, seed: int = 7
) -> Column:
    """``bands`` independent hyperplane signatures per vector, as
    ``array<long>`` (element i = band i's packed ``bits_per_band`` sign
    bits) — the AND-OR amplified form of :func:`lsh_signature`, analogous
    to MinHash banding: a pair is a candidate if ANY band matches.

    For a pair at angle θ, per-bit collision p = 1-θ/π, per-band p^r, and
    band-miss probability (1-p^r)^B — e.g. cosine 0.9 (p=.856), r=8, B=32
    → 1.7e-5. All ``r·B`` projections come from ONE (batch × dim) @
    (dim × r·B) matmul per Arrow batch; the planes are fixed-seed plan-time
    constants (deterministic, model-free)."""
    planes = np.asarray(lsh_hyperplanes(bits_per_band * bands, dim, seed))
    powers = (1 << np.arange(bits_per_band)).astype(np.int64)

    @pandas_udf("array<long>")
    def _sigs(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (mat @ planes.T) > 0  # (n, r·B)
        packed = (bits.reshape(len(mat), bands, bits_per_band) * powers).sum(axis=2)
        return pd.Series(list(packed.astype(np.int64)))

    return _sigs(vec)


def ivf_centroids(
    corpus: DataFrame,
    *,
    vec_col: str,
    n_centroids: int = 16,
    sample_rows: int = 2048,
    iters: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """Train the IVF coarse quantizer: Lloyd k-means on a bounded,
    deterministic sample of the corpus. The sample is drawn by ordering on
    a seeded xxhash64 of the vector and taking the first ``sample_rows`` —
    a TakeOrderedAndProject (per-partition top-N, then a driver merge of
    N-row heads), so it is uniform w.r.t. any physical layout: a corpus
    sorted or clustered by content still yields centroids spread over the
    whole distribution. The sample is the ONLY driver-side transfer —
    O(sample_rows · dim) regardless of corpus size, which is exactly how
    IVF quantizers are trained at scale (FAISS trains on ~100k vectors for
    billion-row indexes). Returns an L2-normalized (n_centroids × dim)
    matrix so that argmax-dot == nearest centroid by cosine."""
    sample = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col), F.lit(seed)))
        .limit(sample_rows)
    )
    vecs = sample.toPandas()[vec_col].to_numpy()
    if len(vecs) == 0:
        # empty corpus (first run / fully-filtered upstream): one zero
        # centroid keeps the quantizer well-formed and the result empty —
        # the Arrow kernels downstream never execute on an empty frame,
        # so the placeholder dimension is never multiplied
        return np.zeros((1, 1), dtype=np.float64)
    mat = np.stack(vecs).astype(np.float64)
    rng = np.random.default_rng(seed)
    centers = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    unit = mat / np.where(norms == 0, 1.0, norms)
    for _ in range(iters):
        cn = np.linalg.norm(centers, axis=1, keepdims=True)
        cu = centers / np.where(cn == 0, 1.0, cn)
        assign = (unit @ cu.T).argmax(axis=1)
        for j in range(len(centers)):
            members = mat[assign == j]
            if len(members):
                centers[j] = members.mean(axis=0)
    cn = np.linalg.norm(centers, axis=1, keepdims=True)
    return centers / np.where(cn == 0, 1.0, cn)


def _nearest_cells(vec: Column, centers: np.ndarray, nprobe: int) -> Column:
    """Array of the ``nprobe`` nearest cell ids for each vector — one
    (batch × dim) @ (dim × n_centroids) matmul per Arrow batch."""

    @pandas_udf("array<int>")
    def _cells(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        sims = mat @ centers.T  # (n, n_centroids); centers pre-normalized
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series(list(top.astype(np.int32)))

    return _cells(vec)


def topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    sample_rows: int = 2048,
) -> DataFrame:
    """Approximate top-k via an IVF index: corpus rows land in their single
    nearest cell, queries probe their ``nprobe`` nearest cells, and the
    candidate set (equi-join on ``cell``) is exactly re-ranked by cosine.

    Scale posture: the corpus-side assignment is a map-only pass (no
    shuffle); the candidate join touches ~nprobe/n_centroids of the corpus
    per query instead of all of it, and remains a hash equi-join — never a
    cross join. Recall/latency trade is the standard IVF dial: raise
    ``nprobe`` toward ``n_centroids`` to approach brute-force."""
    centers = ivf_centroids(
        corpus,
        vec_col=vec_col,
        n_centroids=n_centroids,
        seed=seed,
        sample_rows=sample_rows,
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.element_at(_nearest_cells(F.col(vec_col), centers, 1), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(_nearest_cells(F.col(vec_col), centers, nprobe)).alias("cell"),
    )
    # NOTE (r16): a packed per-cell GEMM variant (one matmul per
    # cell×query-block instead of per-pair Arrow rows) was built and
    # MEASURED SLOWER here — every registry caller probes with ≤10
    # queries, so the pair frame is tiny while packing the corpus into
    # fat collect_list rows costs a full extra shuffle per call. The
    # pair plan is the right shape at realistic query counts; revisit
    # only if a caller ever probes with a corpus-scale query set.
    cands = (
        c.join(F.broadcast(q), on="cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = cands.withColumn("cos", cosine_fast(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos_sim"))
    )


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
    signature: str = "prng",
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE hyperplane LSH: ``tables``
    independent signatures of ``bits`` bits each; a candidate shares any
    table's bucket with the query (with ``multiprobe``, also any bucket at
    Hamming distance 1). Candidates are deduped, then exactly re-ranked.

    ``signature`` picks the hyperplane source: ``"prng"`` (default —
    fixed-seed PCG64, one matmul per batch) or ``"md5"``
    (:func:`lsh_signature_portable` — md5-derived planes + strict
    left-fold projections, bit-reproducible on any engine; the registry's
    oracled instantiation).

    Recall math (why multi-table): with per-hyperplane agreement p =
    1 − θ/π, one b-bit table recalls p^b; L tables recall 1−(1−p^b)^L.
    For coarse neighbors (p≈0.6 — the hard case) 4×8 with multiprobe gives
    ~0.9 recall where a single 12-bit table gives ~0. Bucket-join cost
    scales with L·|corpus|/2^b per query — still a bucket equi-join, never
    a cross join.
    """
    # ONE (tables·bits)-bit signature per row; each table's bucket is a
    # disjoint bit-slice of it. Statistically identical to `tables`
    # independent tables (every bit is an independent hyperplane), but the
    # expensive projection expression appears exactly once per side — the
    # per-table/per-probe variants are constant-time bit ops on the
    # materialized signature column (an order of magnitude less codegen).
    total_bits = bits * tables
    mask = (1 << bits) - 1
    if signature == "prng":
        def sig_of(v: Column) -> Column:
            return lsh_signature(v, bits=total_bits, dim=dim, seed=7)
    elif signature == "md5":
        def sig_of(v: Column) -> Column:
            return lsh_signature_portable(v, bits=total_bits, dim=dim)
    else:
        raise ValueError(f"unknown signature {signature!r} (prng|md5)")

    def table_bucket(sig: Column, t: int) -> Column:
        return F.shiftright(sig, bits * t).bitwiseAND(F.lit(mask))

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        sig_of(F.col(vec_col)).alias("__sig"),
    ).select(
        "neighbor_id",
        "c_vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tab"), table_bucket(F.col("__sig"), t).alias("bucket")
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb"),
    ).select("neighbor_id", "c_vec", "tb.tab", "tb.bucket")

    def q_probes(t: int) -> list[Column]:
        b0 = table_bucket(F.col("__sig"), t)
        buckets = [b0]
        if multiprobe:
            buckets += [b0.bitwiseXOR(F.lit(1 << i)) for i in range(bits)]
        return [
            F.struct(F.lit(t).alias("tab"), b.alias("bucket")) for b in buckets
        ]

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sig_of(F.col(vec_col)).alias("__sig"),
    ).select(
        "query_id",
        "q_vec",
        F.explode(
            F.array(*[p for t in range(tables) for p in q_probes(t)])
        ).alias("tb"),
    ).select("query_id", "q_vec", "tb.tab", "tb.bucket")

    cands = (
        c.join(F.broadcast(q), on=["tab", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn("cos", cosine_fast(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos_sim"))
    )


# Default rows-per-block ceiling for the packed-block GEMM kernels. A packed
# block travels as ONE Spark row (collect_list), so its serialized size must
# stay far under the 2 GB single-row limit: 65,536 rows × 64 dims × 4-byte
# floats ≈ 16 MB per block (two resident per task as float64 matrices ≈
# 64 MB — comfortable executor-task territory). Callers with wider vectors
# should lower it; the kernel enforces it LOUDLY rather than letting a
# skewed/huge block hit the row limit or OOM an executor mid-stage.
MAX_BLOCK_ROWS = 65536


def adaptive_lsh_bits(n: int, *, tables: int = 8, target_cell: int = 128,
                      floor: int = 4) -> int:
    """Corpus-size-adaptive LSH cell width: bits = ceil(log2(n /
    target_cell)), clamped to [floor, 63 // tables] (the whole signature
    packs into ONE int64, so bits*tables must stay under 64). At the
    oracle scale factors (n <= 2048) the derived value EQUALS the
    historical constant 4, so every oracle replay is unchanged — the
    ``dedup.adaptive_band_params`` pattern. Past the packing cap, cell
    sizes grow again with the corpus; the production dial at that point
    is a wider multi-long signature (b = 12+) with re-tuned tables, per
    the knn_graph_lsh docstring."""
    import math

    cap = 63 // tables  # hard int64-packing invariant: bits * tables < 64
    floor = min(floor, cap)  # the floor must never override the cap
    if n <= target_cell:
        return floor
    return max(floor, min(cap, math.ceil(math.log2(n / target_cell))))


def adaptive_sample_mod(n: int, *, target: int = 2048) -> int:
    """Corpus-size-adaptive audit-slice modulus: pick m so a deterministic
    ``id % m == 0`` sample holds ~``target`` rows. m == 1 at every oracle
    corpus size (n <= 2048 ⇒ the "sample" is the whole corpus, outputs
    and oracle SQL unchanged — the ``adaptive_band_params`` pattern);
    beyond, an O(n²)-by-contract gold arm priced through the sample
    becomes O(target·n) — the ``eval_dedup_metrics`` audit-slice shape,
    with the modulus as the documented price dial."""
    return max(1, n // target)


def adaptive_gemm_blocks(n: int, *, target_block: int = 2500, floor: int = 8) -> int:
    """Corpus-size-adaptive block count for the exact blocked-GEMM sweeps:
    keeps per-task score matrices near target_block² (~50 MB of doubles)
    instead of letting blocks — and with them task memory and allocation
    churn — grow linearly with the corpus. Flops are unchanged (exact
    brute force pays O(n²·dim) by contract); only the data movement and
    task granularity change, and the graph is blocking-invariant
    (pytest-pinned)."""
    import math

    return max(floor, math.ceil(n / target_block))


def _pack_blocks(df: DataFrame, *, id_col: str, vec_col: str, block: Column) -> DataFrame:
    """(block, ids array<long>, vecs array<array>) — one row per block, built
    with collect_list so each GEMM task gets a whole block as two arrays.
    The ids/vecs lists are collected in ONE agg so their elements correspond
    positionally within a single output row; nothing downstream may assume
    that ORDER is stable across re-executions (collect_list order follows
    shuffle-fetch order) — the scoring kernel masks self-pairs by id
    EQUALITY, never by position."""
    return (
        df.select(
            block.alias("block"),
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("v"),
        )
        .groupBy("block")
        .agg(
            F.collect_list("vid").alias("ids"),
            F.collect_list("v").alias("vecs"),
        )
    )


def _gemm_topk_partials(joined: DataFrame, *, k: int, max_block_rows: int) -> DataFrame:
    """Score every (src, dst) of each joined block pair with one BLAS matmul
    and emit each src's LOCAL top-k. ``joined`` must carry ids_a/vecs_a/
    ids_b/vecs_b. Self-pairs are masked by id EQUALITY (ids are unique), so
    correctness never depends on collect_list producing the same element
    order on the two legs of the join — on a cluster the a/b legs recompute
    the groupBy independently and shuffle-fetch order is not deterministic
    (this replaced a positional fill_diagonal that silently corrupted
    same-block results whenever the orders diverged). Blocks larger than
    ``max_block_rows`` raise loudly (see :data:`MAX_BLOCK_ROWS`)."""
    out_schema = "src long, dst long, cos double"

    def _score(pdf_iter):
        for pdf in pdf_iter:
            outs = []
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                if len(ids_a) > max_block_rows or len(ids_b) > max_block_rows:
                    raise ValueError(
                        f"packed GEMM block exceeds max_block_rows="
                        f"{max_block_rows} (got {max(len(ids_a), len(ids_b))}); "
                        "raise n_blocks / add more LSH bits so blocks shrink, "
                        "or lower k·dim — a block travels as ONE Spark row "
                        "and must stay far under the 2 GB row limit"
                    )
                ma = np.stack([np.asarray(v, dtype=np.float64) for v in row.vecs_a])
                mb = np.stack([np.asarray(v, dtype=np.float64) for v in row.vecs_b])
                na = np.linalg.norm(ma, axis=1)
                nb = np.linalg.norm(mb, axis=1)
                cos = (ma @ mb.T) / np.outer(
                    np.where(na == 0, 1.0, na), np.where(nb == 0, 1.0, nb)
                )
                # mask self-pairs by id equality — order-independent and
                # exact (ids unique); also covers blocks that share ids
                # when the same vector lands in multiple LSH tables
                cos[ids_a[:, None] == ids_b[None, :]] = -np.inf
                kk = min(k, cos.shape[1])
                top = np.argpartition(-cos, kth=kk - 1, axis=1)[:, :kk]
                for i in range(cos.shape[0]):
                    for j in top[i]:
                        c = cos[i, j]
                        if np.isfinite(c):
                            outs.append((int(ids_a[i]), int(ids_b[j]), float(c)))
            yield pd.DataFrame(outs, columns=["src", "dst", "cos"])

    return joined.mapInPandas(_score, out_schema)


def knn_graph_blocked(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_blocks: int | None = None,
    n_rows: int | None = None,
    queries: DataFrame | None = None,
    query_n_blocks: int | None = None,
    max_block_rows: int = MAX_BLOCK_ROWS,
) -> DataFrame:
    """Exact k-NN graph via BLOCKED GEMM: vectors are hash-assigned to
    ``n_blocks`` blocks; the n_blocks² block pairs cross-join (each row
    carries two packed blocks), and one numpy matmul per block pair
    scores every (src, dst) in it, emitting only each src's LOCAL top-k;
    a final per-src window keeps the global top-k among the
    n_blocks × k partials.

    Why this shape: the naive pair explosion (self-join then per-pair
    scoring) moves O(n²·dim) vector bytes through the shuffle/Arrow
    boundary — measured 13 s at 2k×64-dim where this runs in ~1 s moving
    only O(n·dim·n_blocks) bytes (each block is re-sent once per
    partner). Flops stay O(n²·dim) — brute force is exact by paying
    them — but as ONE BLAS call per block pair instead of 4M interpreted
    rows. Block count tunes task memory (two blocks resident per task;
    blocks above ``max_block_rows`` fail loudly — see
    :data:`MAX_BLOCK_ROWS`). Beyond GEMM reach, prune candidates first —
    :func:`knn_graph_lsh` is that path — and reuse the same top-k
    window. ``n_blocks=None`` derives the block count from the corpus
    size (:func:`adaptive_gemm_blocks` — 8 at the oracle/bench SFs,
    more beyond so per-task matrices stay ~target_block² instead of
    growing with the corpus; the r9 deep sweep measured fixed 8-block
    packing paying 28× time for 9× flops at sf3 from allocation churn
    alone).

    ``queries`` restricts the SRC side to a subset frame (same id/vec
    columns): each query row gets its exact top-k over the FULL corpus
    (self excluded by id), at O(|q|·n·dim) flops instead of O(n²·dim) —
    the audit-slice shape the attestation entries price their gold arms
    with. The dst side is still the whole ``df``."""
    if n_blocks is None:
        # n_rows lets an entry that invokes several adaptive operators over
        # the same input count ONCE and share it (ADVICE r9: each derivation
        # adding its own eager .count() action re-scans the corpus)
        n_blocks = adaptive_gemm_blocks(df.count() if n_rows is None else n_rows)
    packed = _pack_blocks(
        df,
        id_col=id_col,
        vec_col=vec_col,
        block=F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)),
    )
    if queries is None:
        a_packed = packed
    else:
        if query_n_blocks is None:
            query_n_blocks = adaptive_gemm_blocks(queries.count())
        a_packed = _pack_blocks(
            queries,
            id_col=id_col,
            vec_col=vec_col,
            block=F.pmod(F.xxhash64(F.col(id_col)), F.lit(query_n_blocks)),
        )
    a = a_packed.select(
        F.col("block").alias("block_a"),
        F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"),
    )
    b = packed.select(
        F.col("block").alias("block_b"),
        F.col("ids").alias("ids_b"),
        F.col("vecs").alias("vecs_b"),
    )
    partials = _gemm_topk_partials(
        a.crossJoin(b), k=k, max_block_rows=max_block_rows
    )
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
    return (
        partials.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("src", "dst", F.round("cos", 4).alias("cos_sim"), "rk")
    )


def knn_graph_lsh(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 3,
    bits: int | None = None,
    n_rows: int | None = None,
    tables: int = 8,
    dim: int = 64,
    seed: int = 7,
    max_block_rows: int = MAX_BLOCK_ROWS,
    signature: str = "prng",
) -> DataFrame:
    """Approximate k-NN graph: BLOCKED GEMM over LSH candidate cells — the
    production path beyond exact-GEMM reach that
    :func:`knn_graph_blocked`'s docstring names. ``signature`` picks the
    hyperplane source, as in :func:`topk_lsh` ("prng" default; "md5" =
    :func:`lsh_signature_portable`, the oracle-replayable instantiation).

    Each vector lands in one cell per LSH table ((table, bucket) from a
    ``bits``-bit slice of one shared hyperplane signature, as in
    :func:`topk_lsh`); cells are packed exactly like the exact path's
    blocks, and each cell GEMM-scores only against its Hamming≤1 probe
    cells WITHIN the same table — (1 + bits) partner cells out of 2^bits —
    instead of all n_blocks² pairs. The same (src, dst) found in several
    tables is collapsed by a (src, dst) max-cos agg before the final
    per-src top-k window, so duplicate discoveries never eat rank slots.

    Cost vs exact: flops drop from O(n²·dim) to O(n²·dim·L·(1+b)/2^b) in
    expectation (L tables, b bits — ~8× fewer at L=8, b=4; hundreds× at
    the b=12+ a real corpus would use), and cell size — not corpus size —
    bounds task memory. Recall is the standard multi-table dial
    (1-(1-P_table)^L with P_table = P(Hamming≤1) = p^b + b·p^(b-1)(1-p));
    pytest pins recall ≥ 0.9 against the exact graph; the registry
    entry attests that floor as a deterministic invariant, and the exact
    sibling ``knn_graph_topk`` carries the full edge-list oracle.

    ``bits=None`` derives the cell width from the corpus size
    (:func:`adaptive_lsh_bits` — equal to the historical 4 at oracle
    SFs, wider beyond so CELL SIZE stays bounded instead of growing
    linearly with the corpus; the r9 deep sweep measured fixed 4-bit
    cells quadratic past sf1)."""
    if bits is None:
        # see knn_graph_blocked: n_rows shares one count across operators
        bits = adaptive_lsh_bits(df.count() if n_rows is None else n_rows, tables=tables)
    total_bits = bits * tables
    mask = (1 << bits) - 1
    if signature == "prng":
        sig_col = lsh_signature(F.col(vec_col), bits=total_bits, dim=dim, seed=seed)
    elif signature == "md5":
        sig_col = lsh_signature_portable(F.col(vec_col), bits=total_bits, dim=dim)
    else:
        raise ValueError(f"unknown signature {signature!r} (prng|md5)")
    base = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        sig_col.alias("__sig"),
    )
    cells = base.select(
        "vid",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tab"),
                        F.shiftright(F.col("__sig"), bits * t)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb"),
    ).select("vid", "v", "tb.tab", "tb.bucket")
    packed = _pack_blocks(
        cells,
        id_col="vid",
        vec_col="v",
        block=F.struct(F.col("tab"), F.col("bucket")),
    )
    # a-leg probes its own cell plus the `bits` Hamming-1 flips; the b-leg
    # is keyed by its true cell, so the join is a plain equi-join on
    # (table, bucket) — never a cross join. Pairs of distinct cells appear
    # in both directions (A probes B and B probes A), which the graph
    # needs anyway: src rows live on the a-leg only.
    a = packed.select(
        F.col("block").alias("cell_a"),
        F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"),
        F.explode(
            F.array(
                F.col("block.bucket"),
                *[
                    F.col("block.bucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(bits)
                ],
            )
        ).alias("probe"),
    ).select(
        F.col("cell_a.tab").alias("tab"),
        F.col("probe").alias("bucket"),
        "ids_a",
        "vecs_a",
    )
    b = packed.select(
        F.col("block.tab").alias("tab"),
        F.col("block.bucket").alias("bucket"),
        F.col("ids").alias("ids_b"),
        F.col("vecs").alias("vecs_b"),
    )
    partials = _gemm_topk_partials(
        a.join(b, on=["tab", "bucket"]), k=k, max_block_rows=max_block_rows
    )
    # collapse multi-table rediscoveries of the same edge; max() of the
    # (float-identical up to BLAS rounding) rescorings keeps the agg
    # deterministic on fixed data
    edges = partials.groupBy("src", "dst").agg(F.max("cos").alias("cos"))
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
    return (
        edges.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("src", "dst", F.round("cos", 4).alias("cos_sim"), "rk")
    )


def gemm_threshold_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    cell_col: str,
    threshold: float,
    n_blocks: int = 4,
    max_block_rows: int = MAX_BLOCK_ROWS,
) -> DataFrame:
    """ALL cosine pairs >= ``threshold`` WITHIN each cell (blocking key),
    scored by blocked GEMM — the execution engine for cluster-blocked
    dedup (SemDeDup): the caller supplies the cell assignment (k-means
    cid, LSH bucket, ...) and this pays exactly O(sum c_i^2 * dim) flops
    as BLAS matmuls instead of an interpreted per-pair fold.

    Cells are split into ``n_blocks`` hash sub-blocks so task memory is
    bounded by block size, not cell size; the within-cell block-pair join
    takes each unordered sub-block pair once (block_a <= block_b). Each
    unordered id pair is emitted exactly once, canonicalized id_a < id_b:
    same-block matrices keep the strict upper triangle BY ID (order-
    independent), cross-block matrices emit every entry canonicalized.
    Returns (id_a, id_b, cell, cos). Deterministic on fixed data; the
    same id must not appear in two cells (one assignment per vector)."""
    packed = (
        df.select(
            F.col(cell_col).alias("cell"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("block"),
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("v"),
        )
        .groupBy("cell", "block")
        .agg(F.collect_list("vid").alias("ids"), F.collect_list("v").alias("vecs"))
    )
    a = packed.select(
        "cell",
        F.col("block").alias("block_a"),
        F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"),
    )
    b = packed.select(
        "cell",
        F.col("block").alias("block_b"),
        F.col("ids").alias("ids_b"),
        F.col("vecs").alias("vecs_b"),
    )
    joined = a.join(b, on="cell").where(F.col("block_a") <= F.col("block_b"))

    # The ids are stacked into int64 matrices, so id_col must be integral —
    # fail fast with a clear message instead of an opaque numpy error inside
    # the pandas iterator. The cell key passes through untouched, so its
    # output type is derived from the input (an LSH bucket may be a string;
    # ADVICE r6).
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        raise TypeError(
            f"gemm_threshold_pairs: id_col {id_col!r} must be an integral type, "
            f"got {id_type.simpleString()}"
        )
    cell_type = df.schema[cell_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cell", cell_type),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def _score(pdf_iter):
        for pdf in pdf_iter:
            outs = []
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                if len(ids_a) > max_block_rows or len(ids_b) > max_block_rows:
                    raise ValueError(
                        f"packed GEMM block exceeds max_block_rows="
                        f"{max_block_rows}; raise n_blocks so blocks shrink"
                    )
                ma = np.stack([np.asarray(v, dtype=np.float64) for v in row.vecs_a])
                mb = np.stack([np.asarray(v, dtype=np.float64) for v in row.vecs_b])
                na = np.linalg.norm(ma, axis=1)
                nb = np.linalg.norm(mb, axis=1)
                cos = (ma @ mb.T) / np.outer(
                    np.where(na == 0, 1.0, na), np.where(nb == 0, 1.0, nb)
                )
                # each unordered pair exactly once: strict upper triangle
                # BY ID (works for same-block, where both orientations are
                # present); cross-block entries appear once and are
                # canonicalized below
                same = row.block_a == row.block_b
                ii, jj = np.nonzero(cos >= threshold)
                for i, j in zip(ii, jj):
                    x, y = int(ids_a[i]), int(ids_b[j])
                    if same:
                        if x >= y:
                            continue
                    elif x == y:
                        continue
                    lo, hi = (x, y) if x < y else (y, x)
                    outs.append((lo, hi, row.cell, float(cos[i, j])))
            yield pd.DataFrame(outs, columns=["id_a", "id_b", "cell", "cos"])

    return joined.mapInPandas(_score, out_schema)
