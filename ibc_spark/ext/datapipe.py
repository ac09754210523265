"""Training-dataset assembly operators: deterministic splits, vocabulary
building, and token-budget packing.

The reference (`/root/reference`, SURVEY.md §2) has no dataset-assembly
surface at all; these are the operations an LLM training-data pipeline runs
after cleaning/dedup (the `ext.dedup` / `ext.text` stage): carve the corpus
into reproducible train/val/test splits, build a global token vocabulary,
and bin documents into fixed token budgets for sequence packing.

Scale posture (100 TB):

- Splits are STATELESS — a pure arithmetic hash of the key column, no
  sampling, no driver-side randomness, no shuffle. Every executor decides
  each row's split independently, and the assignment is stable across runs,
  re-partitions, and engines (the multiplicative hash uses only 64-bit
  integer arithmetic, so DuckDB computes bit-identical buckets).
- Vocabulary building is explode → partial-agg → top-k: the per-partition
  partial aggregation collapses each partition to its distinct terms before
  the single shuffle, and the final top-k is TakeOrdered (no global sort).
- Packing is a per-group running sum (window) — one shuffle on the group
  column; each group's documents are processed in a single partition's
  sorted stream, which is exactly the layout a downstream packer wants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth's multiplicative constant (golden-ratio scaled to 2^32). The hash is
# `(pmod(key, 2^31) * KNUTH) mod 2^32`, uniform on the low bits for
# sequential keys and computable in exact 64-bit arithmetic by every engine:
# the pmod-reduced key is < 2^31, so the product stays < 2^63 (no int64
# overflow under ANSI Spark, no HUGEINT promotion in DuckDB), and pmod keeps
# every remainder non-negative even for negative keys.
_KNUTH = 2654435761
_KEY_MOD = 2147483648  # 2^31
_MOD = 4294967296  # 2^32


def hash_bucket(key: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer key column.
    Safe for negative keys and keys above 2^32 (see module constant note).
    SQL mirror: ``((key % 2^31 + 2^31) % 2^31 * KNUTH) % 2^32 % n``."""
    key = F.col(key) if isinstance(key, str) else key
    reduced = F.pmod(key.cast("long"), F.lit(_KEY_MOD))
    return F.pmod(F.pmod(reduced * F.lit(_KNUTH), F.lit(_MOD)), F.lit(n_buckets))


def hash_split(
    df: DataFrame,
    key: str,
    splits: tuple[tuple[str, int], ...] = (("train", 90), ("val", 5), ("test", 5)),
) -> DataFrame:
    """Assign every row to a named split by hashing ``key``.

    ``splits`` is (name, percent) with percents summing to 100. Rows with
    equal keys always land in the same split (so near-dup clusters keyed by
    their kept-id stay together — no train/test leakage)."""
    total = sum(p for _, p in splits)
    if total != 100:
        raise ValueError(f"split percents must sum to 100, got {total}")
    bucket = hash_bucket(key, 100)
    expr: Column | None = None
    edge = 0
    for name, pct in splits:
        edge += pct
        cond = bucket < edge
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def vocab_topk(
    df: DataFrame, tokens_col: Column, k: int = 100, doc_id: str = "doc_id"
) -> DataFrame:
    """Global top-k vocabulary: (term, term_count, doc_freq), ordered by
    count desc with term as the deterministic tie-break. ``tokens_col`` is
    an array<string> column expression."""
    exploded = df.select(F.col(doc_id), F.explode(tokens_col).alias("term"))
    counts = exploded.groupBy("term").agg(
        F.count(F.lit(1)).alias("term_count"),
        F.countDistinct(doc_id).alias("doc_freq"),
    )
    return counts.orderBy(F.col("term_count").desc(), F.col("term")).limit(k)


def tfidf_top_terms(
    df: DataFrame,
    tokens_col: Column,
    *,
    doc_id: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)`` — the sklearn-style smooth idf), the
    classic keyword/feature extraction pass over a corpus.

    Plan: explode → (doc, term) count [the one heavy shuffle] → document
    frequency as a COUNT window over term on that same aggregate (no second
    scan/explode — a separate ``groupBy(term)`` branch defeats exchange
    reuse through column pruning and rescans the corpus) → broadcast one-row
    N → per-doc top-k window. All arithmetic in doubles, identical across
    engines.

    Rows with a NULL ``doc_id`` are dropped up front: ``count_distinct``
    would exclude them from N while the tf/df aggregations would still keep
    a NULL-keyed group, scoring it with an inconsistent (potentially
    marginally negative) smoothed idf.
    """
    df = df.where(F.col(doc_id).isNotNull())
    tok = df.select(F.col(doc_id).alias("doc_id"), F.explode(tokens_col).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # count_distinct, not count: a source with duplicate doc_id rows (e.g. an
    # un-deduped ingest) must not inflate N while the tf agg merges the rows
    n_docs = df.select(F.col(doc_id)).agg(F.count_distinct(F.col(doc_id)).alias("n_docs"))
    wdf = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(wdf))
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select("doc_id", "term", "tf", "tfidf")
    )


def pack_by_token_budget(
    df: DataFrame,
    group: str,
    order: str,
    n_tokens: Column,
    budget: int,
) -> DataFrame:
    """Assign each document a pack/bin id so consecutive documents (by
    ``order`` within ``group``) share a bin of ~``budget`` tokens:
    ``bin = floor(exclusive_prefix_sum(n_tokens) / budget)``.

    This is token-offset binning — the streaming-friendly, shuffle-once
    packing used when documents are concatenated in corpus order (documents
    straddling a boundary are split by the downstream tokenizer). It is
    deterministic and window-expressible, unlike bin-packing heuristics
    that need stateful iteration."""
    w = Window.partitionBy(group).orderBy(order)
    cum = F.sum(n_tokens).over(w) - n_tokens  # exclusive prefix sum
    return df.withColumn("bin_id", F.floor(cum / F.lit(budget)))


def chunk_token_windows(
    df: DataFrame,
    *,
    id_col: str,
    tokens_col: Column,
    chunk_size: int,
    stride: int | None = None,
) -> DataFrame:
    """Split each document into fixed-size token windows with optional
    overlap — the context-window chunking step before tokenization/packing
    (RAG indexing and long-doc training both need it).

    Window i covers tokens ``[i*stride, i*stride + chunk_size)``; the last
    window is emitted as long as it starts inside the document, so trailing
    tokens are never dropped (it may be short). Pure explode over a
    ``sequence`` of offsets — narrow, zero shuffle, and the token array is
    sliced per window without re-tokenizing (the array enters as a direct
    function argument, not a lambda body).

    Returns (id, chunk_idx, chunk_tokens, n_chunk_tokens).
    """
    if stride is None:
        stride = chunk_size
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = df.select(F.col(id_col).alias("doc_id"), tokens_col.alias("__toks"))
    # number of windows: ceil(max(n - chunk_size, 0) / stride) + 1 for n > 0,
    # capped at ceil(n / stride) so a stride larger than chunk_size never
    # emits a window starting past the document's end (phantom empty chunk)
    n = F.size(F.col("__toks"))
    n_windows = F.when(n <= 0, F.lit(0)).otherwise(
        F.least(
            F.floor((F.greatest(n - chunk_size, F.lit(0)) + stride - 1) / stride) + 1,
            F.floor((n + stride - 1) / stride),
        )
    )
    # NB: Spark's sequence(0, -1) is a DESCENDING [0, -1], not empty — an
    # empty doc must produce an empty array explicitly before the explode.
    idxs = F.when(n_windows > 0, F.sequence(F.lit(0), (n_windows - 1).cast("int")))
    out = toks.select(
        "doc_id",
        "__toks",
        F.explode(idxs).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_size)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        chunk.alias("chunk_tokens"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
    )


def mix_epochs(
    df: DataFrame,
    *,
    stratum: str,
    epochs: dict[str, int],
    default_epochs: int = 1,
) -> DataFrame:
    """Corpus mixture weighting by integer epoch counts: replicate each
    row ``epochs[stratum]`` times with an ``epoch`` column (0-based) — the
    deterministic form of "books x3, web x1" upsampling a training run
    feeds the shuffler. Zero-shuffle explode; fractional rates compose with
    :func:`stratified_sample` (e.g. 2.5 epochs = 3 epochs + keep 50%% of
    epoch 2)."""
    if any(e < 0 for e in epochs.values()) or default_epochs < 0:
        raise ValueError("epoch counts must be >= 0")
    n: Column = F.lit(default_epochs)
    for value, count in sorted(epochs.items()):
        n = F.when(F.col(stratum) == value, F.lit(count)).otherwise(n)
    # NB: sequence(0, -1) would be a descending [0, -1]; 0-epoch strata
    # must drop via an explicit NULL (explode of NULL emits nothing).
    reps = F.when(n > 0, F.sequence(F.lit(0), (n - 1).cast("int")))
    return df.withColumn("epoch", F.explode(reps))


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    rates: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its key's hash
    bucket falls below the stratum's percentage.

    The workhorse of corpus mixing ("downsample web text to 10%, keep all
    books"): stateless (same engine-independent multiplicative hash as
    ``hash_split``, so the decision is reproducible and join-free), zero
    shuffle, and composable with ``hash_split`` — a key lands in the same
    bucket everywhere, so sampling then splitting never leaks a dropped
    document back in. ``rates`` maps stratum value → keep-percent [0,100]."""
    bucket = hash_bucket(key, 100)
    rate: Column = F.lit(default_pct)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum) == value, F.lit(pct)).otherwise(rate)
    return df.where(bucket < rate)


def hash_u32(key: Column | str) -> Column:
    """The full 32-bit multiplicative hash value (not reduced to a bucket)
    — a deterministic, engine-independent pseudo-random ORDER over keys.
    SQL mirror: ``((key % 2^31 + 2^31) % 2^31 * 2654435761) % 2^32``."""
    key = F.col(key) if isinstance(key, str) else key
    reduced = F.pmod(key.cast("long"), F.lit(_KEY_MOD))
    return F.pmod(reduced * F.lit(_KNUTH), F.lit(_MOD))


def quota_per_group(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    k: int,
    safety: int = 8,
) -> DataFrame:
    """Deterministic per-group quota sample: keep the ``k`` rows of each
    group whose id-hash is smallest (a reproducible "random" k-per-domain
    downsample — the web-crawl balancing step that stops one giant domain
    from dominating the corpus).

    Scale posture: a naive ``row_number() OVER (PARTITION BY group)`` sorts
    EVERY row of every group in one task per group — a skew trap when one
    domain holds billions of rows. This runs two phases instead:

    1. per-group counts (map-side-combining agg, output = one row per
       group, broadcast back), then a stateless pre-filter keeping only
       rows whose hash lies in the smallest ``k * safety / n`` fraction of
       the hash space — the only rows that can plausibly rank ≤ k;
    2. the exact window rank over the ≈``k * safety`` survivors per group.

    The heavy window sort therefore touches O(groups × k × safety) rows
    regardless of group skew. The pre-filter is PROBABILISTIC — keeping
    the smallest ``k * safety / n`` hash fraction only bounds the chance
    that one of a group's k smallest-hash rows lies above the cutoff — so
    exactness is enforced, not assumed: groups whose survivor count comes
    up short of ``min(k, n)`` are detected (one tiny agg over the
    survivors) and re-drawn through the unfiltered path. The shortfall
    probability per group is Binomial(n, ks/n < k) ≈ e^{-k(safety-1)²/2s}
    (Chernoff; ~1e-10 per group at k=8, safety=8), so the fallback list is
    empty in practice and broadcastable always.

    Returns (group, id, sample_rank) with sample_rank in [1, k].
    """
    base = df.select(
        F.col(group_col).alias("__grp"),
        F.col(id_col).alias("__id"),
        hash_u32(F.col(id_col)).alias("__h"),
    )
    counts = base.groupBy("__grp").agg(F.count(F.lit(1)).alias("__n"))
    cutoff = F.when(F.col("__n") <= k * safety, F.lit(_MOD)).otherwise(
        (F.lit(float(_MOD * k * safety)) / F.col("__n")).cast("long") + 1
    )
    survivors = base.join(F.broadcast(counts), "__grp").where(
        F.col("__h") <= cutoff
    ).select("__grp", "__id", "__h")
    # exactness guard: groups where the pre-filter kept fewer than
    # min(k, n) rows fall back to their full row set (re-scan of base is
    # a map-side broadcast semi join — no extra shuffle of the big side).
    # Anchored on `counts` (LEFT JOIN the survivor agg, coalesce to 0) so a
    # group whose pre-filter kept ZERO rows — absent from `survivors`
    # entirely, the one tail the guard exists for — still lands in the
    # shortfall list instead of vanishing from the output.
    short = (
        counts.join(
            survivors.groupBy("__grp").agg(F.count(F.lit(1)).alias("__s")),
            "__grp",
            "left",
        )
        .where(
            F.coalesce(F.col("__s"), F.lit(0))
            < F.least(F.lit(k).cast("long"), F.col("__n"))
        )
        .select("__grp")
    )
    pool = survivors.join(F.broadcast(short), "__grp", "left_anti").unionByName(
        base.join(F.broadcast(short), "__grp", "left_semi")
    )
    w = Window.partitionBy("__grp").orderBy(F.col("__h").asc(), F.col("__id").asc())
    return (
        pool.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
        .select(
            F.col("__grp").alias(group_col),
            F.col("__id").alias(id_col),
            F.col("sample_rank").cast("long").alias("sample_rank"),
        )
    )


def assign_shards(df: DataFrame, *, key_col: str, n_shards: int) -> DataFrame:
    """Deterministic shard assignment for training-data writes: shard =
    hash_bucket(key, n_shards). Stateless arithmetic (zero shuffle); the
    writer pairs it with ``df.repartition(n_shards, "shard")`` +
    ``partitionBy("shard")`` so each output shard is one balanced file
    group. Same hash family as :func:`hash_split` /
    :func:`sample_stratified`, so shards are stable across runs/engines."""
    return df.withColumn("shard", hash_bucket(key_col, n_shards).cast("long"))


def assign_contiguous_ids(
    df: DataFrame,
    *,
    order_by: list[str],
    id_name: str = "new_id",
    partitions: int = 32,
) -> DataFrame:
    """Contiguous 1-based ids in ``order_by`` order WITHOUT the
    single-task global window (``row_number() OVER (ORDER BY ...)`` pulls
    every row through ONE partition — the classic driver-shaped bottleneck
    of corpus id assignment at 100 TB).

    Two-phase global rank instead:

    1. range-repartition on the order keys (range boundaries from Spark's
       sampler; inter-partition order is guaranteed, so partition id is
       monotone in the key order) and PERSIST — both downstream consumers
       must see the SAME materialized boundaries, and the persist is what
       pins the sampled partitioning for them (registered in
       ``ext.persistreg`` like every operator persist);
    2. per-partition counts -> cumulative offsets (aggregate-sized window
       over ≤``partitions`` rows, broadcast back) + per-partition local
       row_number; final id = offset[pid] + local rank.

    Result = exact global rank (offsets absorb whatever boundaries the
    sampler chose), each partition sorts only its own slice.

    Order keys must be non-null: Spark ranks NULLS FIRST where most SQL
    engines default NULLS LAST, so a nullable key silently diverges from
    a SQL oracle — filter or coalesce nulls before calling.
    """
    from pyspark.sql import Window

    from ibc_spark.ext.persistreg import persist_tracked

    keys = [F.col(c) for c in order_by]
    ranged = persist_tracked(
        df.repartitionByRange(partitions, *keys).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    offsets = (
        ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    local = F.row_number().over(Window.partitionBy("__pid").orderBy(*keys))
    return (
        ranged.join(F.broadcast(offsets), on="__pid")
        .withColumn(id_name, (F.col("__offset") + local).cast("long"))
        .drop("__pid", "__offset")
    )
