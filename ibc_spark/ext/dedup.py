"""Deduplication operators for training-data pipelines (SURVEY §7.7).

Five families, each designed around its 100 TB shuffle profile:

- exact        — hash-groupBy on a normalization key: ONE shuffle.
- n-gram Jaccard — blocked pairwise verification: shuffle on the blocking
                 key only; never an unblocked cross join.
- MinHash+LSH  — signatures are a narrow map; banding turns near-dup search
                 into an equi-join on band keys (the standard
                 shingle→minhash→band→bucket-join plan, cf. Broder '97 /
                 MMDS ch.3). Candidate verification is a second narrow map.
- SimHash      — 16-bit signature via a single array fold; dup groups are a
                 groupBy on the signature. Zero pairwise work.
- embedding cosine — blocked pairwise cosine, scored by an Arrow-batched
                 vectorized kernel (one numpy pass per batch).

Execution-strategy note: Spark evaluates higher-order-function lambdas
INTERPRETED (outside whole-stage codegen), so every heavy per-row array
computation here runs as an Arrow-batched numpy/Python kernel over
JVM-side-prepared inputs instead — pairwise cosine scoring (~500× vs the
HOF fold on 200k 64-dim pairs), MinHash permutation mins and SimHash bit
votes (reduceat over the batch's flattened hashes), 8-gram construction
for decontamination, and passage windows. Tokenization and shingle
hashing stay JVM-side (xxhash64 in codegen; no regex-dialect divergence),
and each kernel has a Column-form twin kept as the engine-exact reference
with a bit-identity pytest. Frames consumed by multiple join legs
(hashed shingles, postings, banded signatures) are persisted
MEMORY_AND_DISK — Spark shares no subplans across consumers, so without
the persist each leg re-runs the derivation pipeline.
"""

from __future__ import annotations

import threading
import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ibc_spark.ext.foldspec import md5_double_hash, md5_double_hash_py
from ibc_spark.ext.persistreg import persist_tracked
from ibc_spark.ext.text import tokens

MERSENNE = 2147483647  # 2^31-1


def widen_for_compute(df: DataFrame) -> DataFrame:
    """Widen a SCAN-narrow frame before a compute-heavy per-row kernel.

    Parquet scan parallelism follows input BYTES (maxPartitionBytes), which
    under-parallelizes CPU-bound projections over small-but-dense inputs:
    a 6 MB text table reads as 2 splits, so tokenise→shingle→persist and
    the posting explode that follows run on 2 of 32 cores (measured 6.9 s
    vs 1.0 s for the same kernel scan-wide at sf1, and ~25 s of the
    33 s `dedup_ngram_containment` first run). Repartition to the
    session's default parallelism ONLY when the scan is narrower — on a
    real 100 TB scan (thousands of input splits) this is a no-op, so the
    cheap raw-text shuffle is paid exactly when it buys CPU width."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def widen_for_arrow_chain(df: DataFrame) -> DataFrame:
    """Quarter-width :func:`widen_for_compute` for CHAINED Arrow-kernel
    pipelines (attach → transcode → features is three mapInPandas stages,
    each paying a per-task python-worker/Arrow boundary cost).

    Full core-width repartitioning was measured SLOWER than no widening
    at all for the light audio codec entries once their per-sample loops
    were vectorized (r15 A/B at sf0.1, 3-run best: stereo-ADPCM none/8/32
    = 0.90/0.56/1.12 s, mu-law 0.82/0.48/0.95 s, resample
    0.43/0.39/0.65 s) — 3 stages × 32 tasks of ~150 rows is boundary
    overhead, not parallelism. Quarter width keeps the kernel parallel
    while batches stay big enough for the vector kernels. Same scale
    posture as widen_for_compute: on a real multi-split scan this is a
    no-op, so the constant only shapes the small-corpus bench, never the
    100 TB plan."""
    target = max(2, df.sparkSession.sparkContext.defaultParallelism // 4)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

# Live `bloom_flag_docs` bitset broadcasts, oldest first — bounded so
# repeated invocations never accumulate executor state, with a small
# grace window so CONCURRENT queries (a streaming probe next to a batch
# probe — VERDICT r8) are not evicted mid-flight. Eviction uses
# unpersist(), not destroy(): the driver copy survives, so a still-
# running task that lost its executor blocks simply re-fetches.
_BLOOM_BCASTS: list = []
_BLOOM_KEEP = 4
_BLOOM_LOCK = threading.Lock()


def norm_key(c: Column | str, n_tokens: int = 5) -> Column:
    """Normalization key: first-n lowercased tokens. The exact-dedup key for
    near-identical prefixes (headers, boilerplate)."""
    return F.array_join(F.slice(tokens(c), 1, n_tokens), " ")


def dedup_exact(df: DataFrame, *, key: Column | str, id_col: str) -> DataFrame:
    """Exact dedup: keep the minimum id per key; report group size.
    One hash-shuffle on the key; map-side partial aggregation."""
    key = F.col(key) if isinstance(key, str) else key
    return (
        df.groupBy(key.alias("dedup_key"))
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token array.

    Built from n shifted slices combined with nested ``zip_with`` — the
    token array appears only as a direct function ARGUMENT (evaluated once
    per row), never inside a lambda body. The obvious
    ``transform(sequence(1, len), i -> array_join(slice(toks, i, n)))``
    re-evaluates the (collapsed-in) tokenization per position — measured
    ~40× slower on 300-char docs.
    """
    m = F.greatest(F.size(toks) - n + 1, F.lit(1))
    out = F.slice(toks, n, m)  # rightmost words of each shingle
    for off in range(n - 2, -1, -1):
        # prepend the previous word; concat_ws drops the NULL padding that
        # zip_with adds when the right slice runs past the array end.
        out = F.zip_with(
            F.slice(toks, off + 1, m), out, lambda a, b: F.concat_ws(" ", a, b)
        )
    # parity with the position-loop form: an empty token array yields [""].
    return F.array_distinct(
        F.when(F.size(toks) == 0, F.array(F.lit(""))).otherwise(out)
    )


def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard of two (distinct-element) arrays, as a double."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


def passage_windows(toks: Column, *, window: int, stride: int) -> Column:
    """Array of ``(start_tok, passage)`` structs: FULL ``window``-token
    passages starting at 1-based positions 1, 1+stride, 2·stride+1, …
    (docs shorter than ``window`` yield an empty array).

    Same construction discipline as :func:`shingles`: the windows come from
    ``window`` shifted slices merged with ``zip_with`` — the token array is
    only ever a function ARGUMENT, never re-evaluated inside a lambda body
    (the collapsed-in recompute is ~40× slower on real docs)."""
    m = F.greatest(F.size(toks) - window + 1, F.lit(0))  # count of full windows
    out = F.slice(toks, window, m)  # rightmost token of each window
    for off in range(window - 2, -1, -1):
        out = F.zip_with(F.slice(toks, off + 1, m), out, lambda a, b: F.concat_ws(" ", a, b))
    structs = F.transform(
        out, lambda p, i: F.struct((i + 1).alias("start_tok"), p.alias("passage"))
    )
    return F.filter(structs, lambda s: (s["start_tok"] - 1) % stride == 0)


def _window_passages(window: int, stride: int):
    """Arrow-batched (start_tok, passage) window kernel over pre-tokenized
    arrays, shared by :func:`passage_exact_dups` (stride 5) and
    :func:`duplicate_spans` (stride 1) so the two can never desync
    (review r8). Same rationale as ``contamination_tags``'s kernel: the
    zip_with-chain Column form runs window-1 interpreted passes per row;
    joining slices in Python per batch emits identical structs, and
    tokenization stays JVM-side so there is no regex divergence.
    Documents shorter than ``window`` tokens yield NO windows."""

    @pandas_udf("array<struct<start_tok:int,passage:string>>")
    def _k(toks_s: pd.Series) -> pd.Series:
        out = []
        for t in toks_s:
            if t is None or len(t) < window:
                out.append([])
            else:
                tl = list(t)
                out.append(
                    [
                        (i + 1, " ".join(tl[i : i + window]))
                        for i in range(0, len(tl) - window + 1, stride)
                    ]
                )
        return pd.Series(out)

    return _k


def passage_exact_dups(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    window: int = 10,
    stride: int = 5,
) -> DataFrame:
    """Exact repeated-passage spans across the corpus — the fixed-window,
    Spark-native equivalent of suffix-array substring dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    any ``window``-token passage occurring more than once (within or across
    documents) is reported per occurrence with its group stats, so callers
    can cut the non-canonical spans.

    Plan shape: narrow tokenize + window explode (zero shuffle) → ONE
    hash shuffle on the passage key for the three window functions (count,
    distinct docs, canonical rank). Nothing is pairwise; group state is
    O(occurrences of one passage), and a degenerate mega-passage (the same
    boilerplate everywhere) is exactly the AQE skew-split case."""
    from pyspark.sql import Window

    passages_np = _window_passages(window, stride)

    occ = (
        df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
        .select("doc_id", F.explode(passages_np(F.col("toks"))).alias("w"))
        .select("doc_id", F.col("w.start_tok").alias("start_tok"), F.col("w.passage").alias("passage"))
    )
    grp = Window.partitionBy("passage")
    rank = grp.orderBy("doc_id", "start_tok")
    return (
        occ.withColumn("n_copies", F.count(F.lit(1)).over(grp))
        .withColumn("n_docs", F.size(F.collect_set("doc_id").over(grp)).cast("long"))
        .withColumn("is_canonical", F.row_number().over(rank) == 1)
        .where(F.col("n_copies") > 1)
        .select("doc_id", "start_tok", "passage", "n_copies", "n_docs", "is_canonical")
    )


def _gap_merge_span_ids(cut_windows: DataFrame, window: int) -> DataFrame:
    """THE one sweep gap-merge over (doc_id, start_tok) duplicated-window
    frames, shared by :func:`duplicate_spans` and :func:`spans_rewrite` so
    the merge condition can never desync between report and apply (review,
    this session): a window OPENS a new span iff its start exceeds the
    running max end of all earlier windows + 1; span_id = running sum of
    open flags. One doc_id shuffle; group state is O(that doc's windows)."""
    w_doc = Window.partitionBy("doc_id").orderBy("start_tok")
    prev_end = F.max(F.col("start_tok") + window - 1).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    return cut_windows.withColumn(
        "opens",
        F.when(prev_end.isNull() | (F.col("start_tok") > prev_end + 1), 1).otherwise(0),
    ).withColumn(
        "span_id",
        F.sum("opens").over(
            w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def duplicate_spans(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    window: int = 10,
) -> DataFrame:
    """MAXIMAL duplicated token spans per document — the full Spark-native
    equivalent of suffix-array substring dedup (Lee et al. 2022): every
    stride-1 ``window``-token passage occurring more than once anywhere in
    the corpus (across documents OR repeated within one) marks its token
    range duplicated; overlapping/adjacent duplicated ranges then merge
    into maximal spans, which is exactly the set of tokens a
    substring-level deduper would cut. ``passage_exact_dups`` (stride 5)
    reports occurrences of fixed windows; this reports the MERGED spans at
    token resolution — arbitrary-offset duplicated substrings of any
    length ≥ window, without building a suffix array.

    Plan shape: stride-1 window explode (~1 row per corpus token — linear,
    the same asymptotics as the suffix-array's O(n) but embarrassingly
    parallel) → ONE hash shuffle on the passage key for the occurrence
    count → ONE shuffle on doc_id for the per-doc sort-merge windows. The
    gap-merge is the classic sweep: a window opens a new span iff its
    start exceeds the running max end of all earlier windows + 1; span id
    = running sum of open flags; spans aggregate per (doc, span id). Group
    state per doc is O(its duplicated windows); a boilerplate mega-passage
    is the AQE skew-split case on the first shuffle. At 100 TB the passage
    string itself would be replaced by xxhash64(passage) in the shuffle
    key (collision-negligible, 8-byte keys) — kept as the string here so
    the oracle replays byte-identically."""

    windows_np = _window_passages(window, stride=1)

    occ = (
        df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
        .select("doc_id", F.explode(windows_np(F.col("toks"))).alias("w"))
        .select(
            "doc_id",
            F.col("w.start_tok").alias("start_tok"),
            F.col("w.passage").alias("passage"),
        )
    )
    dup = (
        occ.withColumn(
            "n_occ", F.count(F.lit(1)).over(Window.partitionBy("passage"))
        )
        .where(F.col("n_occ") > 1)
        .select("doc_id", "start_tok")
    )
    flagged = _gap_merge_span_ids(dup, window)
    return (
        flagged.groupBy("doc_id", "span_id")
        .agg(
            F.min("start_tok").alias("span_start"),
            (F.max("start_tok") + window - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            "doc_id",
            F.col("span_id").cast("int").alias("span_id"),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).cast("long").alias(
                "span_tokens"
            ),
            "n_windows",
        )
    )


def spans_rewrite(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    window: int = 10,
) -> DataFrame:
    """APPLY substring dedup — rewrite each document with its non-canonical
    duplicated spans removed (the step Lee et al. 2022 run after finding
    duplicated substrings; :func:`duplicate_spans` only *reports* spans).

    Semantics: every stride-1 ``window``-token passage occurring more than
    once in the corpus keeps its CANONICAL occurrence (min (doc_id,
    start_tok) — the deterministic keep-first rule the exact-dedup family
    uses) and cuts all others; per document the cut windows gap-merge into
    maximal disjoint ranges, and the cleaned text is the remaining tokens
    re-joined in original order — CASE-PRESERVED (matching runs on the
    lowercased tokens like every dedup key here, but the rewrite emits the
    document's own token spellings; only whitespace runs are normalized,
    since the output is defined over the token stream, not raw bytes).
    Lowercasing never touches whitespace, so the two splits' positions
    align exactly.

    Plan shape (three linear shuffles, nothing pairwise):
    passage-key shuffle for (count, canonical rank) → doc_id shuffle for
    the sweep gap-merge (the shared :func:`_gap_merge_span_ids`) → doc_id
    join attaching the per-doc span array (disjoint merged ranges, bounded
    by the doc's own token count — the same O(doc) group class as per-doc
    tokenization) back onto the corpus; the token filter against that
    array is a codegen projection. The base (scan + both token splits) is
    persisted — it feeds the occurrence leg AND the final join. At 100 TB
    the passage string in the first shuffle key becomes xxhash64(passage),
    exactly as in :func:`duplicate_spans`."""
    windows_np = _window_passages(window, stride=1)

    raw_toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != ""
    )
    base = persist_tracked(
        widen_for_compute(df).select(
            F.col(id_col).alias("doc_id"),
            tokens(F.col(text_col)).alias("toks"),
            raw_toks.alias("raw_toks"),
        )
    )
    occ = base.select(
        "doc_id", F.explode(windows_np(F.col("toks"))).alias("w")
    ).select("doc_id", F.col("w.start_tok").alias("start_tok"), F.col("w.passage").alias("passage"))
    grp = Window.partitionBy("passage")
    cuts = (
        occ.withColumn("n_occ", F.count(F.lit(1)).over(grp))
        .withColumn(
            "rk", F.row_number().over(grp.orderBy("doc_id", "start_tok"))
        )
        .where((F.col("n_occ") > 1) & (F.col("rk") > 1))
        .select("doc_id", "start_tok")
    )
    spans = (
        _gap_merge_span_ids(cuts, window)
        .groupBy("doc_id", "span_id")
        .agg(
            F.min("start_tok").alias("s"),
            (F.max("start_tok") + window - 1).alias("e"),
        )
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("cut_spans"))
    )
    pos_structs = F.transform(
        F.col("raw_toks"), lambda t, i: F.struct((i + 1).alias("pos"), t.alias("tok"))
    )
    no_spans = F.array().cast("array<struct<s:int,e:int>>")
    kept = F.filter(
        pos_structs,
        lambda st: ~F.exists(
            F.coalesce(F.col("cut_spans"), no_spans),
            lambda sp: (st["pos"] >= sp["s"]) & (st["pos"] <= sp["e"]),
        ),
    )
    return (
        base.join(spans, on="doc_id", how="left")
        .withColumn("kept_arr", kept)
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            (F.size("toks") - F.size("kept_arr")).cast("long").alias("cut_tokens"),
            F.size("kept_arr").cast("long").alias("kept_tokens"),
            F.array_join(
                F.transform("kept_arr", lambda st: st["tok"]), " "
            ).alias("cleaned_text"),
        )
    )


def boilerplate_passages(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    group_col: str,
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """CCNet-style boilerplate detection (Wenzek et al. 2020 dedup stage,
    re-keyed to fixed token n-grams because the corpus has no line
    structure): an n-gram is BOILERPLATE within a ``group_col`` slice
    (source/domain — the mirror-site signal) when it appears in at least
    ``min_docs`` DISTINCT documents of that slice. Per document, report
    how much of it is boilerplate — the signal CCNet thresholds to drop
    navigation chrome, cookie banners and footers before training.

    Plan shape: stride-1 n-gram explode (distinct per doc — presence, not
    multiplicity, is the document-frequency notion) → ONE shuffle on
    (group, passage) for the distinct-doc count → per-doc re-aggregation.
    Both aggregations are hash-partial; nothing pairwise, no windows. The
    exploded occurrence frame is persisted — it feeds both the DF count
    and the probe side of the join (the Arrow window kernel is the
    expensive part; without the persist it runs twice)."""
    windows_np = _window_passages(n, stride=1)

    base = widen_for_compute(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        tokens(F.col(text_col)).alias("toks"),
    )
    occ = persist_tracked(
        base.select(
            "doc_id",
            "grp",
            F.explode_outer(
                F.array_distinct(
                    F.transform(windows_np(F.col("toks")), lambda w: w["passage"])
                )
            ).alias("passage"),
        )
    )
    df_counts = (
        occ.where(F.col("passage").isNotNull())
        .groupBy("grp", "passage")
        .agg(F.countDistinct("doc_id").alias("doc_freq"))
    )
    per_doc = (
        occ.join(df_counts, on=["grp", "passage"], how="left")
        .groupBy("doc_id", "grp")
        .agg(
            F.count(F.col("passage")).alias("n_passages"),
            F.sum(
                F.when(F.col("doc_freq") >= min_docs, 1).otherwise(0)
            ).alias("n_boilerplate"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("grp").alias("source"),
        F.col("n_passages").cast("long").alias("n_passages"),
        F.col("n_boilerplate").cast("long").alias("n_boilerplate"),
        F.round(
            F.when(F.col("n_passages") > 0, F.col("n_boilerplate"))
            .otherwise(0)
            .cast("double")
            / F.greatest(F.col("n_passages"), F.lit(1)),
            6,
        ).alias("boilerplate_ratio"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Blocked pairwise near-dup detection: within each block, emit ordered
    pairs whose shingle-set Jaccard ≥ threshold. ADAPTIVE plan — both arms
    exactness-preserving, chosen by the threshold:

    **High threshold (≥ 0.5): PREFIX-FILTERED inverted index** (PPJoin
    lineage — Xiao et al., WWW'08):

    1. each doc posts only its PREFIX — its first |A| − ⌈t·|A|⌉ + 1
       shingles under a global total order (the xxhash64 order, computed
       ROW-LOCALLY by sorting the shingle array: no df-statistics pass,
       aggregation, or window touches the postings before pruning).
       PPJoin's prefix-filtering principle: two sets with J ≥ t MUST
       share a prefix element under ANY consistent total order, so
       joining prefixes loses no qualifying pair while shrinking the
       quadratic co-occurrence stage by ~(1−t)²;
    2. the LENGTH filter (t·|B| ≤ |A| ≤ |B|/t) prunes size-mismatched
       candidates as a codegen predicate before the dedup shuffle;
    3. candidates re-attach the full (distinct-element) shingle arrays by
       id and verify with one JVM ``array_intersect`` — exact Jaccard,
       computed once per candidate pair, never per co-occurrence row.
       This is the arm that survives boilerplate-heavy corpora at 100 TB,
       where common shingles make the un-filtered index quadratic.

    **Low threshold (< 0.5): full inverted-index count-join.** Below 0.5
    the prefix is most of the set (p/|A| = 1 − t + 1/|A|), so prefix
    machinery prunes ~nothing and its sort/verify overhead is a pure
    loss — measured 40% slower at t=0.05 on the bench corpus. The plain
    postings self-join + per-pair count aggregation IS the right plan in
    the low-selectivity regime: |A∩B| falls out of the count, Jaccard
    from |A∪B| = |A|+|B|−|A∩B|, no second pass over arrays. (Low-t
    similarity joins are intrinsically near-quadratic in co-occurrences;
    no filter family changes that, cf. the PPJoin paper's t ≥ 0.5
    evaluation range.)

    Within a block of m docs the naive plan paid O(m²) array
    intersections; both arms pay one shuffled row per (prefix)
    co-occurrence instead. The join key (block, shingle) is
    high-cardinality, so skew lands on genuinely common shingles only;
    AQE skew-split covers those.
    """
    raw = widen_for_compute(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(block_col).alias("block"),
        shingles(tokens(F.col(text_col)), n).alias("sh"),
    ).select("doc_id", "block", "sh", F.size("sh").alias("sz"))
    length_ok = (F.col("sz_a") >= threshold * F.col("sz_b")) & (
        F.col("sz_b") >= threshold * F.col("sz_a")
    )
    jac = F.col("common").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("common")
    )

    if threshold < 0.5:
        base = persist_tracked(raw)
        postings = base.select(
            "doc_id", "block", "sz", F.explode("sh").alias("shingle")
        )
        a = postings.select(
            F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"), "block", "shingle"
        )
        b = postings.select(
            F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"), "block", "shingle"
        )
        pairs = (
            a.join(b, on=["block", "shingle"])
            .where((F.col("id_a") < F.col("id_b")) & length_ok)
            .groupBy("id_a", "id_b", "sz_a", "sz_b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
        return (
            pairs.withColumn("jaccard", jac)
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )

    # (r16) hashed prefix machinery: every shingle is replaced by its
    # xxhash64 up front. The global prefix total order IS the hash order
    # (exactly the order the previous struct sort keyed on), so nothing
    # about candidate generation changes — but postings shuffle an 8-byte
    # long instead of a ~30-byte string, and the exact verification
    # intersects long arrays instead of string arrays. Jaccard over hashed
    # DISTINCT shingles equals string-shingle Jaccard short of an int64
    # collision — the same documented exposure the MinHash family carries
    # (``_hashed_shingle_frame``); ``sz`` stays the string-distinct count.
    hbase = persist_tracked(
        raw.select(
            "doc_id", "block", "sz",
            F.array_sort(F.transform("sh", lambda s: F.xxhash64(s))).alias("hsh"),
        )
    )
    p_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    prefix = hbase.select(
        "doc_id",
        "block",
        "sz",
        F.posexplode(F.slice(F.col("hsh"), F.lit(1), p_len)).alias("i0", "h"),
    )
    a = prefix.select(
        F.col("doc_id").alias("id_a"),
        F.col("sz").alias("sz_a"),
        (F.col("i0") + 1).alias("ia"),
        "block",
        "h",
    )
    b = prefix.select(
        F.col("doc_id").alias("id_b"),
        F.col("sz").alias("sz_b"),
        (F.col("i0") + 1).alias("ib"),
        "block",
        "h",
    )
    # PPJoin positional filter (Xiao et al., WWW'08 §3.2): a co-occurrence
    # at 1-based prefix positions (ia, ib) bounds the pair's overlap by
    # 1 + min(sz_a − ia, sz_b − ib) (both arrays share one total order, so
    # every further common element lies strictly after BOTH positions).
    # J ≥ t needs overlap ≥ t·(sz_a+sz_b)/(1+t); rows whose bound can't
    # reach it are dropped BEFORE the pair dedup. The 1e-6 slack keeps the
    # filter strictly more permissive than the verify stage's own IEEE
    # compare, so it can never drop a pair verification would accept —
    # exactness-preserving, candidates only shrink.
    ubound = 1 + F.least(F.col("sz_a") - F.col("ia"), F.col("sz_b") - F.col("ib"))
    alpha = F.lit(threshold / (1.0 + threshold)) * (F.col("sz_a") + F.col("sz_b"))
    cands = (
        a.join(b, on=["block", "h"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & length_ok
            & (ubound.cast("double") + F.lit(1e-6) >= alpha)
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = (
        cands.join(
            hbase.select(F.col("doc_id").alias("id_a"), F.col("hsh").alias("sh_a")),
            on="id_a",
        )
        .join(
            hbase.select(
                F.col("doc_id").alias("id_b"),
                F.col("hsh").alias("sh_b"),
                F.col("sz").alias("sz_b"),
            ),
            on="id_b",
        )
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("sz_a", F.size("sh_a"))
    )
    return (
        verified.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 2,
    threshold: float = 0.15,
) -> DataFrame:
    """Blocked DIRECTED containment pairs: within each block, emit ordered
    (inner, outer) pairs with shingle containment |A∩B| / |A| ≥ threshold
    (A = inner). Jaccard misses the "quoted inside a larger page" shape —
    a 100-gram doc fully embedded in a 10,000-gram doc has Jaccard ≈ 0.01
    but containment 1.0; this is the operator that catches near-subset
    duplication (partial scrapes, quote farms, boilerplate wrappers).

    Plan: inverted-index count join (the exactness-preserving low-threshold
    arm of ``ngram_jaccard_pairs`` — containment working points sit well
    below the PPJoin prefix-filter regime, so prefix machinery would prune
    ~nothing). The co-occurrence join runs UNDIRECTED (strict id order) so
    each shared shingle shuffles ONE row, not one per direction — halving
    the dominant stage of the whole plan — and both directed containments
    (|A∩B|/|A|, |A∩B|/|B|) fall out of the single per-pair count, emitted
    by a post-aggregation explode and filtered per direction. (The
    per-direction |B| ≥ t·|A| length prune only fires at size ratios
    > 1/t — at working thresholds it prunes less than the duplication it
    would force, so the undirected form strictly wins.) |A∩B| falls out
    of the count; no second pass over the shingle arrays. Join key
    (block, shingle) is high-cardinality; skew lands on genuinely common
    shingles only, which AQE skew-split covers."""
    base = persist_tracked(
        widen_for_compute(df).select(
            F.col(id_col).alias("doc_id"),
            F.col(block_col).alias("block"),
            shingles(tokens(F.col(text_col)), n).alias("sh"),
        ).select("doc_id", "block", "sh", F.size("sh").alias("sz"))
    )
    # drop the degenerate '' shingle an empty/whitespace doc produces
    # (shingles() pads short docs): such docs carry no content and the
    # SQL oracle's list_distinct drops their NULL gram, so both engines
    # must exclude them from the pair space (review r8)
    postings = base.where(F.col("sz") > 0).select(
        "doc_id", "block", "sz", F.explode("sh").alias("shingle")
    ).where(F.col("shingle") != "")
    a = postings.select(
        F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"), "block", "shingle"
    )
    b = postings.select(
        F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"), "block", "shingle"
    )
    pairs = (
        a.join(b, on=["block", "shingle"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    c = F.col("common").cast("double")
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("inner_id"),
                    F.col("id_b").alias("outer_id"),
                    (c / F.col("sz_a")).alias("containment"),
                ),
                F.struct(
                    F.col("id_b").alias("inner_id"),
                    F.col("id_a").alias("outer_id"),
                    (c / F.col("sz_b")).alias("containment"),
                ),
            )
        ).alias("d")
    )
    return directed.select("d.*").where(F.col("containment") >= threshold)


def distinct_ngrams_np(n: int):
    """Arrow-batched distinct word ``n``-gram kernel over PRE-TOKENIZED
    arrays: at n=8 the zip_with-chain Column form runs n-1 interpreted
    passes per row and dominated `contamination_tags` (~70% of runtime);
    joining token slices in Python per batch produces the identical
    distinct gram strings (tokenization itself stays JVM-side, so there is
    no regex-dialect divergence). Documents shorter than ``n`` tokens
    yield NO grams (no whole-doc fallback — a 5-token doc must not match
    on a sub-8-gram). Shared by `contamination_tags` and
    `bloom_contamination`."""

    @pandas_udf("array<string>")
    def _grams(toks: pd.Series) -> pd.Series:
        out = []
        for t in toks:
            if t is None or len(t) < n:
                out.append([])
            else:
                tl = list(t)
                out.append(
                    list(
                        dict.fromkeys(
                            " ".join(tl[i : i + n]) for i in range(len(tl) - n + 1)
                        )
                    )
                )
        return pd.Series(out)

    return _grams


def contamination_tags(
    corpus: DataFrame,
    testset: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: tag each corpus document with the number
    of distinct word ``n``-grams it shares with a held-out test set (the
    standard GPT-3/PaLM-style 8-gram overlap check — a training pipeline
    drops or redacts ``contaminated`` rows before training so benchmark
    answers don't leak into the model).

    Plan shape at 100 TB: corpus shingles are an explode (narrow); the test
    set's distinct shingles are orders of magnitude smaller than the corpus
    (benchmarks are MBs, corpora TBs) and BROADCAST, so the membership probe
    is a map-side hash semi-join — no corpus shuffle on n-gram keys; the
    only wide op is the per-doc hit count, one shuffle on ``id_col``.
    Returns (doc_id, n_hits, contaminated) for every corpus row.

    Documents shorter than ``n`` tokens produce NO n-grams on either side
    (``shingles`` otherwise falls back to a whole-doc shingle, which would
    let a 5-token doc "contaminate" on a sub-8-gram match — not a real
    8-gram overlap).
    """

    true_ngrams_np = distinct_ngrams_np(n)
    c_sh = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(true_ngrams_np(tokens(F.col(text_col)))).alias("g"),
    )
    t_sh = (
        testset.select(F.explode(true_ngrams_np(tokens(F.col(text_col)))).alias("g"))
        .dropDuplicates()
    )
    # shingles() already emits distinct n-grams per doc → count(*) == distinct
    hits = (
        c_sh.join(F.broadcast(t_sh), on="g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    ids = corpus.select(F.col(id_col).alias("doc_id"))
    return ids.join(hits, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
        F.col("n_hits").isNotNull().alias("contaminated"),
    )


def _bloom_bases(g: Column) -> tuple[Column, Column]:
    """Portable double-hashing bases for a shingle string: h1 = first 60
    md5 bits, h2 = next 60 md5 bits forced odd (so it is nonzero and
    coprime with any power-of-two filter size). Position i is
    (h1 + i*h2) % m — the standard Kirsch–Mitzenmacher construction, and
    expressible identically in DuckDB (the oracle replays it). Delegates
    to :func:`ibc_spark.ext.foldspec.md5_double_hash`, THE one definition
    shared with the Count-Min entries, so the spellings cannot drift."""
    return md5_double_hash(g)


def bloom_build(
    testset: DataFrame, *, text_col: str, n: int = 8, m_bits: int = 65536, k: int = 4
) -> DataFrame:
    """Build a MERGEABLE Bloom filter over the test set's distinct word
    ``n``-grams as a sparse (word_idx, bits) frame: ≤ m/32 rows regardless
    of input size, entirely JVM-side (md5 + bit ops, no Python), and two
    filters merge by unioning and re-`bit_or`-ing — the same
    store-per-benchmark / merge-on-read shape as the CMS/HLL sketches.
    ``k`` must keep i*h2 inside int64: h2 < 2^61, so k ≤ 4."""
    if k > 4:
        raise ValueError("bloom_build: k > 4 overflows the int64 double-hash")
    grams = distinct_ngrams_np(n)
    t_g = (
        testset.select(F.explode(grams(tokens(F.col(text_col)))).alias("g"))
        .dropDuplicates()
    )
    h1, h2 = _bloom_bases(F.col("g"))
    pos = (
        t_g.select(h1.alias("h1"), h2.alias("h2"))
        .select(F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"), "h1", "h2")
        .select(((F.col("h1") + F.col("i") * F.col("h2")) % m_bits).alias("pos"))
        .dropDuplicates()
    )
    # shiftleft's Python wrapper wants a literal shift amount; the SQL form
    # accepts a column expression
    # 32-bit words in a BIGINT container: DuckDB's checked << overflows at
    # bit 63 (Spark wraps silently), so the portable form never shifts past
    # bit 31
    return pos.groupBy(F.expr("pos DIV 32").alias("word_idx")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
        ).alias("bits")
    )


def bloom_contamination(
    corpus: DataFrame,
    testset: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 8,
    m_bits: int = 65536,
    k: int = 4,
) -> DataFrame:
    """Bloom-filter decontamination — the SKETCH-BACKED face of
    :func:`contamination_tags` for the regime where the held-out shingle
    set itself is too large to broadcast as strings: the benchmark side
    compresses to an m-bit Bloom filter (m/8 bytes, here 8 KB; ≤ m/32 = 2048 words) that every
    executor probes locally; a corpus shingle is flagged iff all ``k``
    positions are set. No false negatives (every truly-shared shingle is
    flagged — dropping flagged rows can only over-drop, never leak), FP
    rate ≈ (1-e^{-kn/m})^k, and the filter is mergeable across benchmark
    shards (`bloom_build`). Probe plan: corpus shingles explode ×k
    positions → broadcast join against the ≤m/32-row word frame → all-k
    test per shingle → per-doc counts; one shuffle on (doc_id, g), one on
    doc_id. Returns (doc_id, n_shingles, n_flagged, maybe_contaminated)
    for every corpus row. Fully deterministic (md5 double hashing), so an
    external SQL oracle replays it bit-for-bit."""
    bloom = bloom_build(testset, text_col=text_col, n=n, m_bits=m_bits, k=k)
    grams = distinct_ngrams_np(n)
    c_sh = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(grams(tokens(F.col(text_col)))).alias("g"),
    )
    h1, h2 = _bloom_bases(F.col("g"))
    probes = (
        c_sh.select("doc_id", "g", h1.alias("h1"), h2.alias("h2"))
        .select(
            "doc_id",
            "g",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
            "h1",
            "h2",
        )
        .select(
            "doc_id",
            "g",
            ((F.col("h1") + F.col("i") * F.col("h2")) % m_bits).alias("pos"),
        )
        .withColumn("word_idx", F.expr("pos DIV 32"))
    )
    present = F.col("bits").isNotNull() & (
        F.expr("shiftright(bits, CAST(pos % 32 AS INT)) & 1") == 1
    )
    per_g = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .groupBy("doc_id", "g")
        .agg(F.sum(F.when(present, 1).otherwise(0)).alias("np"))
    )
    per_doc = per_g.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum((F.col("np") == k).cast("long")).alias("n_flagged"),
    )
    ids = corpus.select(F.col(id_col).alias("doc_id"))
    zero = F.lit(0).cast("long")
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", zero).alias("n_shingles"),
        F.coalesce("n_flagged", zero).alias("n_flagged"),
        (F.coalesce("n_flagged", zero) > 0).alias("maybe_contaminated"),
    )


def bloom_bitset(bloom: DataFrame) -> dict[int, int]:
    """Collect a `bloom_build` frame into a {word_idx: bits} dict for
    executor-local probing. The collect is BOUNDED BY CONSTRUCTION at
    m_bits/32 rows (the filter's word count — 2048 rows for the default
    64 Kbit filter) regardless of how much text built it, so this is the
    sketch-to-driver pattern the IVF trainer also uses — never an O(data)
    collect."""
    return {r["word_idx"]: r["bits"] for r in bloom.collect()}


def bloom_flag_docs(
    df: DataFrame,
    bits: dict[int, int],
    *,
    id_col: str,
    text_col: str,
    n: int = 8,
    m_bits: int = 65536,
    k: int = 4,
) -> DataFrame:
    """PRODUCTION-SHAPE Bloom decontamination probe: the filter rides along
    as an in-memory bitset on every executor (a Spark broadcast of the
    bounded `bloom_bitset` dict) and each document is flagged in ONE
    Arrow-batched pass over its own shingles — no join, no aggregation, a
    pure projection. That makes it legal in an append-mode STREAMING query
    (the join+two-aggregation spelling in :func:`bloom_contamination` is
    not), and it is how Bloom filters are actually probed at 100 TB.
    Hashing is the identical md5 double-hash as `bloom_build`
    (``foldspec.md5_double_hash_py`` — the hashlib spelling of THE one
    definition), so the two spellings agree exactly. Returns
    (doc_id, n_shingles, n_flagged, maybe_contaminated) per input row.

    Bounded live broadcasts per process: each invocation registers its
    bitset broadcast in a locked FIFO and unpersists only entries beyond
    the last _BLOOM_KEEP (4), so repeated invocations — the bench runs
    each entry 3×, tests re-invoke — do not accumulate broadcast
    variables on the executors (the resource-leak class ADVICE r6
    flagged), while concurrent queries in one session (streaming probe
    next to batch probe — VERDICT r8's race note) keep a grace window
    and, even if evicted, re-fetch from the driver copy (unpersist, not
    destroy)."""
    sc = df.sparkSession.sparkContext
    b_bits = sc.broadcast(bits)
    with _BLOOM_LOCK:
        _BLOOM_BCASTS.append(b_bits)
        while len(_BLOOM_BCASTS) > _BLOOM_KEEP:
            _BLOOM_BCASTS.pop(0).unpersist()

    @pandas_udf("struct<n_shingles:long,n_flagged:long>")
    def _probe(toks_s: pd.Series) -> pd.DataFrame:
        bb = b_bits.value
        ns_out, nf_out = [], []
        for t in toks_s:
            if t is None or len(t) < n:
                ns_out.append(0)
                nf_out.append(0)
                continue
            tl = list(t)
            grams = dict.fromkeys(
                " ".join(tl[i : i + n]) for i in range(len(tl) - n + 1)
            )
            flagged = 0
            for g in grams:
                h1, h2 = md5_double_hash_py(g)
                hit = True
                for i in range(k):
                    pos = (h1 + i * h2) % m_bits
                    w = bb.get(pos // 32)
                    if w is None or not (w >> (pos % 32)) & 1:
                        hit = False
                        break
                if hit:
                    flagged += 1
            ns_out.append(len(grams))
            nf_out.append(flagged)
        return pd.DataFrame({"n_shingles": ns_out, "n_flagged": nf_out})

    out = df.select(
        F.col(id_col).alias("doc_id"), _probe(tokens(F.col(text_col))).alias("r")
    )
    return out.select(
        "doc_id",
        F.col("r.n_shingles").alias("n_shingles"),
        F.col("r.n_flagged").alias("n_flagged"),
        (F.col("r.n_flagged") > 0).alias("maybe_contaminated"),
    )


def _hash_shingles(sh: Column) -> Column:
    """xxhash64 per shingle folded into [0, 2^31-1) — computed ONCE per
    shingle; the k permutations below are arithmetic over these hashes."""
    return F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE)))


def _hash_shingles_portable(sh: Column) -> Column:
    """ENGINE-PORTABLE shingle hash: first 60 md5 bits mod 2^31-1 — the
    same md5-hex-prefix spelling as ``foldspec.md5_double_hash``, so an
    external SQL oracle replays the hashes (and therefore the signatures,
    band keys, and candidate set) bit-for-bit. Slower than xxhash64 (md5 +
    hex conv per shingle) — the production path stays ``_hash_shingles``;
    this face exists so the banding machinery is oracle-attestable at the
    WORKING threshold, where output depends on candidate generation."""
    return F.transform(
        sh,
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
            F.lit(MERSENNE),
        ),
    )


def _minhash_row(hashed: Column, k: int) -> Column:
    """k-permutation MinHash signature over pre-hashed shingles: for
    permutation i, min over shingles of ((2i+1)·h + i²+7) mod 2^31-1.

    The k mins are PYTHON-UNROLLED (``F.array`` of k ``array_min`` terms),
    not ``transform(sequence(0,k-1), ...)``: with a runtime outer lambda the
    upstream ``hashed`` projection gets collapsed into the lambda body and
    re-evaluated once per permutation (k× the string hashing); k unrolled
    references keep the projection boundary, so shingle hashing runs once
    per row. Measured ~30× on the signature stage.

    The permutation index is bound via a closure FACTORY returning a
    single-parameter lambda: a ``lambda h, i=i`` spelling has two parameters,
    which ``F.transform`` interprets as its ``(element, index)`` form — the
    "permutation" then silently becomes the shingle's array position
    (position-dependent, permutation-invariant signatures: near-identical
    docs stop colliding).
    """

    def perm(i: int):
        a, b = 2 * i + 1, i * i + 7
        return lambda h: (a * h + b) % F.lit(MERSENNE)

    return F.array(
        *[F.array_min(F.transform(hashed, perm(i))) for i in range(k)]
    )


def _minhash_rows_np(k: int):
    """Arrow-batched MinHash signature kernel: identical arithmetic to
    :func:`_minhash_row` ((2i+1)·h + i²+7 mod 2^31-1, min per permutation)
    but one numpy pass per permutation over the whole batch's flattened
    shingle hashes (``np.minimum.reduceat`` for the per-doc mins) instead
    of k interpreted HOF lambdas per row. All values stay < 2^38 so int64
    arithmetic is exact and the result is bit-identical to the Column form
    (pytest asserts equality). NULL/empty shingle arrays produce the same
    all-NULL signature the Column form yields."""

    @pandas_udf("array<long>")
    def _sig(hsh: pd.Series) -> pd.Series:
        arrs = [np.asarray(x, dtype=np.int64) if x is not None else None for x in hsh]
        lens = np.array([0 if a is None else len(a) for a in arrs], dtype=np.int64)
        nonempty = lens > 0
        out: list[list | None] = [[None] * k] * len(arrs)
        if nonempty.any():
            flat = np.concatenate([a for a in arrs if a is not None and len(a)])
            starts = np.zeros(len(arrs) + 1, dtype=np.int64)
            np.cumsum(lens, out=starts[1:])
            ne_starts = starts[:-1][nonempty]
            mins = np.empty((int(nonempty.sum()), k), dtype=np.int64)
            for i in range(k):
                p = (flat * (2 * i + 1) + (i * i + 7)) % MERSENNE
                mins[:, i] = np.minimum.reduceat(p, ne_starts)
            it = iter(mins.tolist())
            out = [next(it) if ne else [None] * k for ne in nonempty]
        return pd.Series(out)

    return _sig


def minhash_signatures(
    df: DataFrame, *, id_col: str, text_col: str, k: int = 32, n: int = 3
) -> DataFrame:
    """(id, signature array<long>[k]) — narrow map, no shuffle."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            _hash_shingles(shingles(tokens(F.col(text_col)), n)).alias("hsh"),
        )
        .select("doc_id", _minhash_rows_np(k)(F.col("hsh")).alias("sig"))
    )


def _shingle_frame(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        shingles(tokens(F.col(text_col)), n).alias("sh"),
    )


def _hashed_shingle_frame(
    df: DataFrame, id_col: str, text_col: str, n: int, *, portable: bool = False
) -> DataFrame:
    """(doc_id, hsh array<long>) — the narrow frame EVERY downstream MinHash
    stage consumes (banding kernel and exact-Jaccard verification alike).

    It is persisted (memory, spill to disk): banding reads it once and the
    pair verification re-attaches it twice, and without a persist Spark
    re-runs the tokenize→shingle→hash pipeline for each consumer (no
    subplan sharing across exchanges). At scale this is the standard
    persist-the-signatures pattern — 8-byte hashes per distinct shingle
    make the frame SMALLER than the raw text column it derives from, and
    Spark's CacheManager matches by canonicalized plan, so repeated calls
    share one cache entry instead of stacking new ones. Jaccard over
    hashed shingles equals string-shingle Jaccard short of an int64
    collision (the oracles verify exact equality at test scale).

    Tracked in ``ext.persistreg``; session owners release after
    materializing results."""
    hasher = _hash_shingles_portable if portable else _hash_shingles
    frame = widen_for_compute(df).select(
        F.col(id_col).alias("doc_id"),
        hasher(shingles(tokens(F.col(text_col)), n)).alias("hsh"),
    )
    return persist_tracked(frame)


def _band_frame(
    base: DataFrame, k: int, bands: int, *, portable: bool = False
) -> DataFrame:
    """(doc_id, band_idx, band_hash) rows from a hashed-shingle frame. Band
    rows carry ONLY the id and the band key — the shingle arrays never
    enter the band shuffle (at scale they dominate shuffle bytes
    otherwise); verification re-attaches them by id. ``portable`` swaps
    the xxhash64 band key for its md5 hex spelling (same join semantics;
    SQL-replayable)."""
    rows_per_band = k // bands

    def band_key(joined: Column) -> Column:
        return F.md5(joined) if portable else F.xxhash64(joined)

    sigs = base.select("doc_id", _minhash_rows_np(k)(F.col("hsh")).alias("sig"))
    return sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    band_key(
                        F.array_join(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            ",",
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_hash")


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    portable: bool = False,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs.

    Plan shape: hashed-shingle frame (persisted — see
    :func:`_hashed_shingle_frame`) → signature kernel → explode k/bands
    band keys per doc → self-equi-join on (band_idx, band_hash) → distinct
    candidate pairs → exact Jaccard verification over the hashed shingle
    sets. The only shuffles are the band-key join and the final distinct —
    both on keys whose cardinality LSH keeps high (no mega-buckets unless
    the data truly is one dup class; AQE skew-split covers that).

    ``portable`` swaps the xxhash64 shingle/band hashes for their md5
    spellings so an external SQL oracle replays the ENTIRE pipeline —
    signatures, band keys, candidate set, verification — bit-for-bit even
    at a working threshold where the output is candidate-generation-
    dependent. Same plan shape, same permutation arithmetic (the Arrow
    signature kernel runs unchanged over the portable hashes).
    """
    base = _hashed_shingle_frame(df, id_col, text_col, n, portable=portable)
    banded = _band_frame(base, k, bands, portable=portable)

    a = banded.select(F.col("doc_id").alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col("doc_id").alias("id_b"), "band_idx", "band_hash")
    cands = (
        a.join(b, on=["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = (
        cands.join(base.select(F.col("doc_id").alias("id_a"), F.col("hsh").alias("sh_a")), on="id_a")
        .join(base.select(F.col("doc_id").alias("id_b"), F.col("hsh").alias("sh_b")), on="id_b")
    )
    return (
        verified.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def cross_corpus_neardup_pairs(
    new: DataFrame,
    seen: DataFrame,
    *,
    id_col: str,
    text_col: str,
    k: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Incremental dedup: near-dup pairs BETWEEN a new batch and an already-
    ingested corpus (daily-ingest shape — dedup the delta against the
    archive without re-pairing the archive with itself).

    Same banded plan as :func:`minhash_lsh_pairs` but the band join is
    new×seen only: candidate volume scales with the batch, not the corpus,
    and the archive side's band keys can be precomputed/persisted. Returns
    (new_id, seen_id, jaccard) for exact-verified pairs ≥ ``threshold``.
    """
    new_base = _hashed_shingle_frame(new, id_col, text_col, n)
    seen_base = _hashed_shingle_frame(seen, id_col, text_col, n)
    nb = _band_frame(new_base, k, bands).select(
        F.col("doc_id").alias("new_id"), "band_idx", "band_hash"
    )
    sb = _band_frame(seen_base, k, bands).select(
        F.col("doc_id").alias("seen_id"), "band_idx", "band_hash"
    )
    cands = (
        nb.join(sb, on=["band_idx", "band_hash"])
        .select("new_id", "seen_id")
        .dropDuplicates(["new_id", "seen_id"])
    )
    verified = (
        cands.join(
            new_base.select(F.col("doc_id").alias("new_id"), F.col("hsh").alias("sh_a")),
            on="new_id",
        )
        .join(
            seen_base.select(
                F.col("doc_id").alias("seen_id"), F.col("hsh").alias("sh_b")
            ),
            on="seen_id",
        )
    )
    return (
        verified.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("new_id", "seen_id", "jaccard")
    )


def simhash(toks: Column, bits: int = 16) -> Column:
    """SimHash signature: per bit, fold +1/−1 votes from each token's
    xxhash64; bit set where the vote sum is positive. One pass over the
    token array, no explode, no shuffle. Bit positions are compile-time
    Python ints (shift amounts can't be lambda variables)."""
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1,
                        F.lit(1).cast("long"),
                    ).otherwise(F.lit(-1).cast("long"))
                    for i in range(bits)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    terms = [
        F.when(F.element_at(votes, i + 1) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _simhash_np(bits: int):
    """Arrow-batched SimHash kernel over PRE-HASHED tokens: bit i of the
    signature is set where sum over tokens of ±1 (sign of hash bit i) is
    positive — the same vote arithmetic as :func:`simhash` but one numpy
    pass per bit over the batch's flattened hashes (``np.add.reduceat``
    for per-doc sums) instead of an interpreted fold that re-evaluates
    ``xxhash64`` per token per bit. Bit-identical to the Column form
    (pytest asserts it): NULL and empty token arrays both yield 0 — the
    Column form's ``when(vote > 0).otherwise(0)`` collapses a NULL
    array's NULL votes to 0 exactly like an empty array's zero votes."""

    @pandas_udf("long")
    def _sig(hashed: pd.Series) -> pd.Series:
        arrs = [np.asarray(x, dtype=np.int64) if x is not None else None for x in hashed]
        lens = np.array([0 if a is None else len(a) for a in arrs], dtype=np.int64)
        nonempty = lens > 0
        sigs = np.zeros(len(arrs), dtype=np.int64)
        if nonempty.any():
            flat = np.concatenate([a for a in arrs if a is not None and len(a)])
            starts = np.zeros(len(arrs) + 1, dtype=np.int64)
            np.cumsum(lens, out=starts[1:])
            ne_starts = starts[:-1][nonempty]
            acc = np.zeros(int(nonempty.sum()), dtype=np.int64)
            for i in range(bits):
                votes = (((flat >> i) & 1) * 2 - 1).astype(np.int64)
                acc += (np.add.reduceat(votes, ne_starts) > 0).astype(np.int64) << i
            sigs[nonempty] = acc
        return pd.Series(sigs)

    return _sig


def simhash_groups(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    bits: int = 16,
    token_hash: str = "xxhash64",
    with_members: bool = True,
) -> DataFrame:
    """Near-dup groups = identical simhash. groupBy on the signature; at
    larger Hamming radii, join on signature ⊕ single-bit masks.

    ``token_hash`` picks the per-token hash: ``"xxhash64"`` (default —
    fastest, JVM-native) or ``"md5_16"`` (first 16 bits of md5 —
    bit-reproducible on any engine, the instantiation the registry runs
    under the external DuckDB oracle). The vote arithmetic downstream is
    hash-agnostic.

    Scale contract: the ``members`` array packs a whole collision group
    into ONE row — bounded by the LARGEST group, which on boilerplate-
    heavy corpora can be a significant corpus fraction. At that scale
    pass ``with_members=False`` (stats only, bounded state) and consume
    memberships as the pre-aggregation (simhash, doc_id) pairs — i.e.
    join docs back on the signature — instead of a packed array."""
    if token_hash == "xxhash64":
        hashed = F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t))
    elif token_hash == "md5_16":
        hashed = F.transform(
            tokens(F.col(text_col)),
            lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long"),
        )
    else:
        raise ValueError(f"unknown token_hash {token_hash!r} (xxhash64|md5_16)")
    sh = df.select(
        F.col(id_col).alias("doc_id"), _simhash_np(bits)(hashed).alias("simhash")
    )
    aggs = [
        F.count(F.lit(1)).alias("group_size"),
        F.min("doc_id").alias("kept_id"),
    ]
    if with_members:
        aggs.append(F.array_sort(F.collect_list("doc_id")).alias("members"))
    return sh.groupBy("simhash").agg(*aggs)


def cosine(a: Column, b: Column) -> Column:
    """Deterministic cosine: element products then a LEFT FOLD sum (same
    result bit-for-bit in any engine that folds left-to-right in doubles)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def cosine_fast(a: Column, b: Column) -> Column:
    """Vectorized pairwise cosine: one (batch × dim) numpy pass per Arrow
    batch. float64 row-wise dot differs from the left fold only in rounding
    order (≤1e-14 relative for 64-dim unit-scale data) — callers round to 4
    decimals, so results are oracle-stable. ~500× faster than the
    interpreted HOF fold on bulk pair scoring."""

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = np.stack(va.to_numpy()).astype(np.float64)
        mb = np.stack(vb.to_numpy()).astype(np.float64)
        dot = np.einsum("ij,ij->i", ma, mb)
        denom = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(dot / np.where(denom == 0, 1.0, denom))

    return _cos(a, b)


def embedding_neardup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.9,
    scoring_partitions: int = 32,
) -> DataFrame:
    """Blocked embedding near-dup: ordered pairs within a block whose cosine
    ≥ threshold. Same blocking contract as :func:`ngram_jaccard_pairs`.

    Scale shape (round 10 — the blocked-GEMM rewrite): the flops are
    O(sum b_i²·dim) by contract (exact within-block all-pairs), but the
    old self-join + per-pair Arrow kernel also MOVED O(sum b_i²·dim)
    vector bytes through the shuffle — the r9 sf10 scan measured ~29 min
    at 200k vectors (exp 1.60). Scoring now runs through
    ``similarity.gemm_threshold_pairs`` (the SemDeDup engine): vectors
    are packed once per (block, sub-block), each sub-block pair is one
    BLAS matmul, and only O(n·dim·n_blocks) bytes travel. Sub-block
    count adapts to the LARGEST block (one cheap count-by-block agg —
    the bounded-planning move), so task memory is bounded by the ~2500-
    row target regardless of block growth; ``scoring_partitions`` is
    retained for API compatibility (parallelism now comes from the
    #cells × sub-block-pairs task grid)."""
    del scoring_partitions  # superseded by the GEMM task grid
    from ibc_spark.ext.similarity import gemm_threshold_pairs

    max_block = (
        df.groupBy(block_col).count().agg(F.max("count")).first()[0] or 0
    )
    n_blocks = max(1, -(-int(max_block) // 2500))
    pairs = gemm_threshold_pairs(
        df,
        id_col=id_col,
        vec_col=vec_col,
        cell_col=block_col,
        threshold=threshold,
        n_blocks=n_blocks,
    )
    return pairs.select("id_a", "id_b", F.round("cos", 4).alias("cos_sim"))


def adaptive_band_params(
    n: int, threshold: float, *, bits_per_band: int | None = None
) -> tuple[int, int]:
    """Corpus-size-adaptive banding parameters (pure math, unit-tested):
    r = max(8, ceil(log2(n/2.5))) keeps the expected RANDOM-collision
    band-bucket size ~2.5 rows at any corpus size (the r8 full-registry
    scan found fixed r=8 saturating its 256-value signature space), and
    B = ceil(ln(2e-5)/ln(1-p^r)) with p = 1-acos(threshold)/π keeps the
    per-pair miss probability AT the threshold ≤2e-5 regardless of r —
    the standard Indyk–Motwani parameterization. Lands on the classic
    (8, 32) for n ≤ 640 at threshold 0.9. threshold=1.0 → p=1 → the miss
    base is clamped (identical vectors collide in every band, any B
    works). Pass ``bits_per_band`` to derive only B for a fixed r."""
    import math

    r = (
        bits_per_band
        if bits_per_band is not None
        else max(8, math.ceil(math.log2(max(n, 8) / 2.5)))
    )
    p = 1.0 - math.acos(threshold) / math.pi
    miss = max(1.0 - p**r, 1e-12)
    bands = max(8, math.ceil(math.log(2e-5) / math.log(miss)))
    return r, bands


def embedding_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    bits_per_band: int | None = None,
    bands: int | None = None,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Embedding near-dup pairs WITHOUT a blocking column: banded
    hyperplane-LSH candidate generation + exact cosine verification — the
    scale path when blocks are large or absent (where
    :func:`embedding_neardup_pairs`'s within-block all-pairs is O(m²)).

    Plan shape mirrors :func:`minhash_lsh_pairs`: one matmul per Arrow
    batch produces ``bands`` signatures per vector (see
    ``similarity.lsh_band_signatures``) → explode to (id, band_idx,
    band_sig) — vectors stay OUT of the band shuffle — → self-equi-join on
    the band key → distinct candidate pairs → re-attach vectors by id →
    one vectorized cosine kernel → threshold filter. Shuffles are all
    equi-key; nothing is quadratic in the corpus.

    ADAPTIVE band width (the round-8 full-registry scale scan's lesson):
    with FIXED r=8 the 256-value band-signature space saturates as the
    corpus grows — at ~6k vectors every band bucket holds ~24 RANDOM
    collisions and the candidate stage grows quadratically again (measured
    47× time for 10× data). When ``bits_per_band`` is None it is derived
    from the corpus count so expected random-collision bucket size stays
    ~2.5 (r = max(8, ceil(log2(n/2.5)))), and ``bands`` then re-derives
    from the banding calculus so the per-pair miss probability AT the
    threshold stays ≤2e-5 regardless of r: B = ceil(ln(2e-5)/ln(1-p^r))
    with p = 1-acos(threshold)/π — the standard LSH parameterization
    (Indyk-Motwani), which lands on the classic (r=8, B=32) at oracle SF
    and (r=12, B=65) at sf1. One count() action buys the corpus size —
    the same bounded-planning move as ``km_train``'s sample.

    Recall: a pair at exactly ``threshold=0.9`` misses every band with
    probability (1-p^r)^B ≤ 2e-5 BY CONSTRUCTION at every corpus size;
    higher-cosine pairs are exponentially safer (4e-17 at 0.99 under
    r=8/B=32). Pruning sharpens as the threshold rises — hyperplane LSH
    is designed for the ≥0.9 regime real embedding dedup (SemDeDup-style)
    runs at; at low thresholds use blocking +
    :func:`embedding_neardup_pairs` instead."""
    from ibc_spark.ext.similarity import lsh_band_signatures  # circular at module level

    base = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    if bits_per_band is None or bands is None:
        d_bits, d_bands = adaptive_band_params(
            base.count() if bits_per_band is None else 0,
            threshold,
            bits_per_band=bits_per_band,
        )
        bits_per_band = bits_per_band if bits_per_band is not None else d_bits
        bands = bands if bands is not None else d_bands
    # both self-join legs consume the banded frame; persist so the
    # signature matmul runs once (narrow rows: id + band key only);
    # tracked for ext.persistreg.release_persisted cleanup
    banded = persist_tracked(
        base.select(
            "vid",
            F.posexplode(
                lsh_band_signatures(
                    F.col("v"), bits_per_band=bits_per_band, bands=bands, dim=dim, seed=seed
                )
            ).alias("band_idx", "band_sig"),
        )
    )
    a = banded.select(F.col("vid").alias("id_a"), "band_idx", "band_sig")
    b = banded.select(F.col("vid").alias("id_b"), "band_idx", "band_sig")
    cands = (
        a.join(b, on=["band_idx", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = (
        cands.join(base.select(F.col("vid").alias("id_a"), F.col("v").alias("v_a")), on="id_a")
        .join(base.select(F.col("vid").alias("id_b"), F.col("v").alias("v_b")), on="id_b")
        .withColumn("cos", cosine_fast(F.col("v_a"), F.col("v_b")))
    )
    return (
        verified.where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos_sim"))
    )


def symdelete_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    max_edit: int = 1,
) -> DataFrame:
    """Fuzzy (edit-distance) join as an EQUI-join via symmetric-delete
    blocking (SymSpell): every string emits itself plus all single-char
    deletion variants; two strings within edit distance 1 — substitution,
    insertion, or deletion — are guaranteed to SHARE a variant, so
    candidates come from a hash equi-join on the variant string and a
    final ``levenshtein`` check removes the false positives.

    The scale story is the point: a naive fuzzy join is a quadratic
    cross-join with a per-pair edit-distance (the plan Spark produces for
    a bare ``levenshtein(a,b) <= k`` predicate — BroadcastNestedLoopJoin);
    this shape is |rows|·(len+1) variant rows through one shuffle, with
    candidates proportional to true near-matches. Entity-resolution 101
    at 100 TB: block, equi-join, verify. ``max_edit`` is fixed at 1 (the
    construction generalizes with deletion PAIRS for k=2 — same join,
    bigger variant set; not needed here)."""
    if max_edit != 1:
        raise NotImplementedError("symmetric-delete blocking implemented for max_edit=1")

    def variants(col: str) -> Column:
        return F.array_union(
            F.array(F.col(col)),
            F.expr(
                f"transform(sequence(1, length({col})),"
                f" i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1)))"
            ),
        )

    lv = left.select(
        F.col(left_id).alias("__lid"), F.col(left_text).alias("__ltxt")
    ).select("__lid", "__ltxt", F.explode(variants("__ltxt")).alias("__v"))
    rv = right.select(
        F.col(right_id).alias("__rid"), F.col(right_text).alias("__rtxt")
    ).select("__rid", "__rtxt", F.explode(variants("__rtxt")).alias("__v"))
    cands = (
        lv.join(rv, on="__v")
        .select("__lid", "__ltxt", "__rid", "__rtxt")
        .dropDuplicates(["__lid", "__rid"])
    )
    return (
        cands.withColumn("dist", F.levenshtein(F.col("__ltxt"), F.col("__rtxt")))
        .where(F.col("dist") <= max_edit)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("dist").cast("long").alias("dist"),
        )
    )
