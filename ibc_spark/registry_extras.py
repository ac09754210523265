"""Round-6 extension entries: driver-attestable Structured Streaming,
frequency sketches (phi-heavy-hitters exact + mergeable Count-Min), shuffle
semi-join reduction, and exact-decimal exponential smoothing.

Why these exist (scale rationale, per entry):

- ``streaming_hourly_rollup`` — the repo's streaming twins were previously
  proven only inside pytest; this entry runs a REAL Structured Streaming
  job (availableNow trigger -> memory sink) under the driver's oracle
  hash-check, so stream-vs-batch parity is externally attested, not just
  locally asserted.
- ``heavy_hitters_cms`` — a Count-Min sketch built entirely JVM-side as a
  SPARSE (row, col, cnt) aggregate: mergeable across partitions/days like
  the HLL/KLL/Theta family, no Python in the hot path, O(d*w) summary
  regardless of input size.
- ``join_semi_reduced`` — Trino-style dynamic-filtering semantics made
  explicit: reduce the fact side with a broadcast semi-join on the dim
  keys BEFORE the shuffle join, so the shuffle moves only surviving rows.
- ``ewma_user_values`` — recursive smoothing re-expressed as a bounded
  convolution so it runs as one window projection (no iteration) with
  exact scaled-integer arithmetic.
- ``events_sliding_rollup`` / ``streaming_sessionize`` — hopping windows,
  and sessionization executed by the streaming engine itself with its
  watermark-closure semantics pinned to a batch oracle.
- ``dedup_semdedup`` — SemDeDup cluster blocking: near-dup search confined
  to k-means cells, O(sum c_i^2) candidates instead of O(n^2).
- ``text_lexicon_score`` / ``basket_lift_pairs`` — broadcast-lexicon
  scoring (SURVEY §7.7) and market-basket lift with type-bounded fan-out.

Cross-engine determinism follows the repo rules (``ibc_spark.registry``):
float sums go through pinned-scale DECIMALs; every computed column is
aliased identically on both sides.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibc_spark.io_.sources import read_table
from ibc_spark.registry_core import dec, query

# decoration-time oracle compositions below reference fragments that these
# modules REGISTER — import them explicitly so a direct
# `import ibc_spark.registry_extras` is self-sufficient (ordering matters:
# without this, only the ibc_spark.registry aggregation order made it work)
from ibc_spark import registry_ext as _dep_registry_ext  # noqa: E402,F401
from ibc_spark import registry_lakehouse as _dep_registry_lakehouse  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Structured Streaming under the driver's oracle check
# ---------------------------------------------------------------------------

_STREAM_SEQ = itertools.count()

# Stateful-aggregation partition count for the availableNow runs: the state
# store initializes one instance PER shuffle partition per run, and these
# entries' state is tiny (O(windows x types) / O(open sessions)), so the
# session default (~cores) pays ~4x the setup for zero parallelism benefit.
# Measured: streaming_sessionize 8.1s -> ~3s at sf0.1 with 8 partitions.
_STREAM_SHUFFLE_PARTITIONS = "8"


# prefix -> the live memory-sink temp view from this prefix's LAST
# invocation (see _run_stream_to_memory).
_STREAM_VIEWS: dict[str, str] = {}


def _run_stream_to_memory(spark: SparkSession, make_writer, prefix: str) -> DataFrame:
    """Run a streaming writer into a fresh in-memory sink table and return
    that table, owning the resources a bare start/await leaks (bench runs
    every entry 3x and tests re-invoke them — ADVICE r6):

    - the checkpoint dir is a throwaway tempdir, removed once the
      availableNow run terminates (the sink data lives in driver memory;
      the checkpoint is only needed across restarts, which a fresh dir
      per invocation precludes anyway);
    - the PREVIOUS invocation's sink view for the same prefix is dropped,
      bounding accumulated sink state to one table per entry. (The
      returned frame is lazy, so the CURRENT view cannot be dropped here;
      callers materialize it before re-invoking the entry — true for the
      driver, bench, and tests.)

    ``make_writer(query_name)`` builds the writer; the shuffle-partition
    override is scoped here because a streaming query materializes inside
    ``awaitTermination`` — so set/restore is race-free, unlike batch."""
    import shutil

    prev = _STREAM_VIEWS.pop(prefix, None)
    if prev is not None:
        try:
            spark.catalog.dropTempView(prev)
        except Exception:
            pass  # a different session owns it — nothing to free here
    name = f"{prefix}_{next(_STREAM_SEQ)}"
    # record BEFORE start(): a run that fails inside awaitTermination has
    # already registered its sink view, and an untracked name could never
    # be dropped by the next invocation (review r7) — dropping a name that
    # never materialized is a harmless no-op above.
    _STREAM_VIEWS[prefix] = name
    ckpt = tempfile.mkdtemp(prefix="ibc_stream_ckpt_")
    key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(key)
    spark.conf.set(key, _STREAM_SHUFFLE_PARTITIONS)
    try:
        q = (
            make_writer(name)
            .option("checkpointLocation", os.path.join(ckpt, "q"))
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, saved)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


@query(
    "streaming_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING face of ``events_hourly_rollup``, executed for real:
    ``readStream`` over the events parquet -> tumbling 1-hour window
    aggregate -> ``availableNow`` trigger -> in-memory sink; the returned
    frame is the sink table, so the driver's hash-check attests the
    streaming engine's output against the batch SQL oracle.

    availableNow processes the existing backlog as bounded micro-batches
    and terminates — exactly the nightly-catchup deployment shape. At
    scale the same plan runs continuously with a watermark (see
    ``ibc_spark.streaming.windows``); complete-mode output is fine here
    because the aggregate state is O(hours x event_types), not O(rows).

    Distinct aggregations are not supported inside streaming aggregates,
    so unlike the batch face this twin carries no ``n_users`` column.
    """
    from ibc_spark.streaming.sources import read_events_stream

    ev = read_events_stream(spark, sf_dir)
    agg = ev.groupBy(
        F.window("ts", "1 hour").alias("w"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", 10, 2)).cast("double").alias("total_value"),
    )
    tbl = _run_stream_to_memory(
        spark,
        lambda name: agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True),
        "streaming_hourly_rollup",
    )
    return tbl.select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def _streaming_bloom_oracle() -> str:
    # identical semantics to the batch entry — the stream processes the same
    # backlog with the same filter, so the batch oracle IS the oracle
    from ibc_spark.registry_core import ORACLES

    return ORACLES["decontaminate_bloom"]


@query("streaming_decontaminate_bloom", oracle=_streaming_bloom_oracle())
def streaming_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC decontamination gate — the ingest-time face of
    ``decontaminate_bloom``, and the streaming family's missing
    stream-vs-STATIC shape (rollup/sessionize/stream-stream-join/dedup
    cover the others): the benchmark's Bloom filter is built ONCE from
    the static holdout, collected as its bounded m/32-word bitset
    (`bloom_bitset` — 2048 rows by construction, never O(data)) and
    broadcast; the documents STREAM is then flagged row-by-row in one
    Arrow-batched projection (`bloom_flag_docs`) — no join, no
    aggregation, so append mode is trivially legal and per-row latency is
    microseconds. This is exactly how a 100 TB ingest pipeline gates
    arriving shards against benchmark contamination: filter state is
    O(m) per executor, stream state is zero. availableNow processes the
    whole backlog, so the result equals the batch entry bit-for-bit and
    the batch oracle attests the streaming run."""
    from ibc_spark.ext.dedup import bloom_bitset, bloom_build, bloom_flag_docs
    from ibc_spark.registry_ext import _BLOOM_K, _BLOOM_M
    from ibc_spark.streaming.sources import read_documents_stream

    hold = read_table(spark, sf_dir, "documents").where(F.col("doc_id") % 97 == 0)
    bits = bloom_bitset(
        bloom_build(hold, text_col="text", n=8, m_bits=_BLOOM_M, k=_BLOOM_K)
    )
    corpus = read_documents_stream(spark, sf_dir).where(F.col("doc_id") % 97 != 0)
    flagged = bloom_flag_docs(
        corpus, bits, id_col="doc_id", text_col="text", n=8, m_bits=_BLOOM_M, k=_BLOOM_K
    )
    return _run_stream_to_memory(
        spark,
        lambda name: flagged.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True),
        "streaming_decontaminate_bloom",
    )


# ---------------------------------------------------------------------------
# phi-heavy-hitters: exact, and a mergeable Count-Min sketch sibling
# ---------------------------------------------------------------------------

# n/_PHI_DENOM is the heavy-hitter threshold: at sf0.01 (10k events / 150
# users, per-user counts 40-86) n/120 ~ 83 keeps the answer non-trivially
# selective; the entries stay correct (possibly empty) at any SF.
_PHI_DENOM = 120

_CMS_DEPTH = 4
_CMS_WIDTH = 1024


@query(
    "heavy_hitters_exact",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) * {_PHI_DENOM} > (SELECT COUNT(*) FROM events)
    """,
)
def heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi-heavy-hitters: users contributing > n/120 of all events.

    One hash aggregate (map-side partial -> final) plus a 1-row count
    frame broadcast into the HAVING predicate — the exact sibling that
    anchors ``heavy_hitters_cms``'s rows-only waiver.
    """
    ev = read_table(spark, sf_dir, "events")
    total = ev.agg(F.count(F.lit(1)).alias("__n"))
    per = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        per.crossJoin(F.broadcast(total))
        .where(F.col("n_events") * _PHI_DENOM > F.col("__n"))
        .select("user_id", "n_events")
    )


def _cms_bases(key: F.Column) -> tuple[F.Column, F.Column]:
    """PORTABLE double-hashing bases for a CMS key (round 7 — previously
    xxhash64, which DuckDB lacks and which forced the entry onto a
    rows-only waiver): h1 = first 60 md5 bits, h2 = next 60 bits forced
    odd. Row ``r``'s cell is (h1 + r*h2) % width — the same
    Kirsch–Mitzenmacher scheme as the Bloom-filter entry, replayable
    verbatim in the SQL oracle. r ≤ 3 keeps h1 + r*h2 inside int64."""
    from ibc_spark.ext.foldspec import md5_double_hash

    return md5_double_hash(key.cast("string"))


def _cms_pos(h1: F.Column, h2: F.Column, row: F.Column, width: int) -> F.Column:
    """The one cell-index expression BOTH build and probe must use (value
    drift between the two sides silently corrupts the sketch; ADVICE r6)."""
    return (h1 + row * h2) % width


from ibc_spark.ext.foldspec import md5_double_hash_sql as _md5_dh_sql  # noqa: E402

_CMS_H_SQL = _md5_dh_sql("CAST(user_id AS VARCHAR)")


@query(
    "heavy_hitters_cms",
    oracle=f"""
    WITH h AS (SELECT user_id, {_CMS_H_SQL} FROM events),
    cells AS (
      SELECT i AS row, (h1 + i * h2) % {_CMS_WIDTH} AS col,
             CAST(count(*) AS BIGINT) AS cnt
      FROM h, range(0, {_CMS_DEPTH}) t(i)
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT user_id, h1, h2, CAST(count(*) AS BIGINT) AS exact_count
      FROM h GROUP BY 1, 2, 3
    ),
    probe AS (
      SELECT c.user_id, c.exact_count, min(s.cnt) AS est_count
      FROM cand c, range(0, {_CMS_DEPTH}) t(i)
      JOIN cells s ON s.row = i AND s.col = (c.h1 + i * c.h2) % {_CMS_WIDTH}
      GROUP BY 1, 2
    )
    SELECT user_id, est_count, exact_count
    FROM probe, (SELECT count(*) AS n FROM events) tot
    WHERE est_count * {_PHI_DENOM} > tot.n
    """,
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """phi-heavy-hitters via a MERGEABLE Count-Min sketch, built entirely
    JVM-side as a sparse aggregate — and since round 7 under the FULL
    hash oracle: the cell hash is portable md5 double hashing
    (`_cms_bases`/`_cms_pos`, the same Kirsch–Mitzenmacher scheme as the
    Bloom entry), so DuckDB replays the exact sketch cells, probes, and
    threshold — the previous xxhash64 form was stuck on a rows-only
    waiver (VERDICT r6 #4's promotion pattern applied here).

    Build: hash each key's two bases once, explode into d=4 (row, col)
    cell hits (col = (h1 + row*h2) mod w=1024) and count per cell — one
    codegen projection + one hash aggregate, single fact-table pass. The
    (row, col, cnt) frame IS the sketch: O(d*w) rows regardless of input
    size, and two sketches merge by unioning and re-summing — the same
    incremental-dashboard shape as the HLL/KLL/Theta entries (store
    per-day sketches, merge on read; no re-scan).

    Probe: each candidate key probes its d cells (broadcast hash join
    against the tiny sketch) and takes the MIN — the classic CMS
    estimate, est >= exact always, E[overestimate] <= n/w. Candidates
    here are the distinct keys (exact count carried in-row so pytest can
    pin est >= exact and est - exact <= 4n/w); in a true streaming
    deployment candidates come from the arriving keys themselves.
    """
    ev = read_table(spark, sf_dir, "events")
    h1, h2 = _cms_bases(F.col("user_id"))
    # ONE scan: bases once per event, then explode into the d hash rows —
    # build and probe share _cms_pos so the two sides cannot drift.
    rows_arr = F.array(*[F.lit(r) for r in range(_CMS_DEPTH)])
    cells = ev.select(h1.alias("h1"), h2.alias("h2")).select(
        F.explode(rows_arr).alias("row"), "h1", "h2"
    ).select(
        "row",
        _cms_pos(F.col("h1"), F.col("h2"), F.col("row"), _CMS_WIDTH).alias("col"),
    )
    sketch = cells.groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))

    total = ev.agg(F.count(F.lit(1)).alias("__n"))
    cand = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    ch1, ch2 = _cms_bases(F.col("user_id"))
    probes = cand
    for r in range(_CMS_DEPTH):
        probes = probes.withColumn(f"c{r}", _cms_pos(ch1, ch2, F.lit(r), _CMS_WIDTH))
    est = None
    joined = probes
    for r in range(_CMS_DEPTH):
        sk = F.broadcast(
            sketch.where(F.col("row") == r).select(
                F.col("col").alias(f"c{r}"), F.col("cnt").alias(f"cnt{r}")
            )
        )
        joined = joined.join(sk, f"c{r}", "left")
        term = F.coalesce(F.col(f"cnt{r}"), F.lit(0))
        est = term if est is None else F.least(est, term)
    joined = joined.withColumn("est_count", est)
    return (
        joined.crossJoin(F.broadcast(total))
        .where(F.col("est_count") * _PHI_DENOM > F.col("__n"))
        .select("user_id", "est_count", "exact_count")
    )


# ---------------------------------------------------------------------------
# Shuffle semi-join reduction (explicit dynamic filtering)
# ---------------------------------------------------------------------------


@query(
    "join_semi_reduced",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_price
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F' AND o.o_totalprice > 200000
    GROUP BY o.o_orderpriority
    """,
)
def join_semi_reduced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side semi-join reduction before the shuffle join — explicit
    dynamic filtering (what Trino's dynamic filters / Spark's runtime
    bloom filter do implicitly).

    The selective predicate lives on orders; naively Spark shuffles ALL
    of lineitem to join it. Here the surviving order keys are broadcast
    as a LEFT SEMI filter on lineitem FIRST, so the shuffle moves only
    matching fact rows — at 100 TB with a 1%-selective dim predicate
    that is a ~100x reduction in shuffled bytes for one extra broadcast
    of the key set. ``tests/test_plans.py`` asserts the semi join is a
    broadcast join sitting BELOW the main join in the physical plan, and
    that Spark's own runtime bloom filter injects ``might_contain`` on
    this exact shape once its size thresholds are met.

    When the key set exceeds broadcast reach, the same plan degrades to a
    bloom filter of the keys (Spark's runtime bloomFilter conf) —
    semantics identical, reduction approximate instead of exact.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000)
    )
    keys = o.select("o_orderkey").distinct()
    li_reduced = li.join(
        F.broadcast(keys), li.l_orderkey == keys.o_orderkey, "left_semi"
    )
    j = li_reduced.join(o, li_reduced.l_orderkey == o.o_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(dec("l_extendedprice", 12, 2)).cast("double").alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# Truncated exponential smoothing as a bounded convolution
# ---------------------------------------------------------------------------

_EWMA_K = 16  # taps; 0.5**16 ~ 1.5e-5 — below any 2-dp signal's resolution

# All arithmetic in scaled BIGINTs so both engines are exact with no
# decimal-precision ceiling: inputs in cents (x100), weight 0.5^(j+1)
# as the integer 2^(K-1-j) over a common denominator 100 * 2^K. A chain
# of exact DECIMAL adds was NOT portable — DuckDB's precision inference
# tops out at 38 mid-chain and silently falls back to DOUBLE.
_EWMA_DENOM = 100 * (2**_EWMA_K)

_EWMA_TERMS_SQL = " + ".join(
    "COALESCE(LAG(cents, %d) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id), 0) * %d"
    % (j, 2 ** (_EWMA_K - 1 - j))
    for j in range(_EWMA_K)
)

_EWMA_ORACLE = f"""
    WITH t AS (
      SELECT user_id, event_id, ts,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents
      FROM events
    )
    SELECT user_id, event_id,
           CAST({_EWMA_TERMS_SQL} AS DOUBLE) / {_EWMA_DENOM}.0 AS ewma_value
    FROM t
    """


@query("ewma_user_values", oracle=_EWMA_ORACLE)
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential smoothing of ``value`` (alpha = 1/2), truncated
    to 16 taps: ewma_t = sum_j 0.5^(j+1) * x_(t-j).

    The textbook EWMA is a recursion (each row depends on the previous
    smoothed value), which would force either a sequential per-key pass
    (``applyInPandas`` — Python in the hot path) or an iterative plan.
    Truncating the impulse response to 16 taps (weights below 2^-16 are
    under any 2-dp signal's resolution) turns it into a FIR convolution:
    16 ``lag`` reads inside ONE window projection — single shuffle on
    user_id, whole-stage codegen, embarrassingly parallel across keys.

    Determinism: all arithmetic is scaled-BIGINT (cents x 2^(K-1-j) over a
    common denominator), exact in both engines with no decimal-precision
    ceiling; the single final division of identical operands is
    IEEE-identical. (A chain of exact DECIMAL adds was not portable:
    DuckDB's precision inference tops out at 38 mid-chain and silently
    falls back to DOUBLE.)
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        (dec("value", 10, 2) * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    terms = None
    for j in range(_EWMA_K):
        term = F.coalesce(F.lag("cents", j).over(w), F.lit(0)) * F.lit(
            2 ** (_EWMA_K - 1 - j)
        )
        terms = term if terms is None else terms + term
    return ev.select(
        "user_id",
        "event_id",
        (terms.cast("double") / F.lit(float(_EWMA_DENOM))).alias("ewma_value"),
    )


# ---------------------------------------------------------------------------
# Sliding (hopping) window rollup
# ---------------------------------------------------------------------------


@query(
    "events_sliding_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) - INTERVAL (s) HOUR AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
    FROM events, (VALUES (0), (1)) shifts(s)
    GROUP BY 1, 2
    """,
)
def events_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every hour (each event lands in exactly two
    overlapping windows) — the hopping-window face of the tumbling
    ``events_hourly_rollup``. Spark's ``window(ts, '2 hours', '1 hour')``
    expands each row into its two windows before the aggregate — the same
    explode-then-reduce the oracle writes explicitly with a 2-row shift
    table. One shuffle, map-side combinable; state is O(windows x types),
    so the identical plan runs as a watermark-bounded stream."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 10, 2)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Streaming sessionization (session_window + watermark), under the oracle
# ---------------------------------------------------------------------------


@query(
    "streaming_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS seq
      FROM marked
    ),
    sess AS (
      SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end,
             count(*) AS n_events
      FROM numbered GROUP BY user_id, seq
    )
    SELECT user_id, session_start, session_end, n_events
    FROM sess
    WHERE session_end <= (SELECT max(ts) FROM events)
    """,
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization executed BY THE STREAMING ENGINE: ``session_window``
    (dynamic gap-merging state store) + a 0-second watermark, availableNow
    trigger, append-mode memory sink. The oracle is the batch
    gaps-and-islands SQL restricted to sessions the watermark has CLOSED
    (session_end = last_ts + gap <= max event time) — append mode only
    emits finalized sessions, so the still-open tail session per user is
    correctly absent. Verified empirically: 945 of 946 batch sessions
    emitted at sf0.001, the one withheld being the max-ts user's open
    session.

    Two semantic deltas vs the batch entry, both inherent to
    ``session_window``: a gap of EXACTLY the 30-minute threshold starts a
    new session (>= vs the batch >), and session_end is last_ts + gap
    (window end) rather than last_ts. At 100 TB the same plan runs
    continuously: state is one in-flight session per active key, evicted
    at the watermark — this availableNow run IS the nightly-catchup
    deployment of it."""
    from ibc_spark.streaming.sources import read_events_stream

    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    tbl = _run_stream_to_memory(
        spark,
        lambda name: agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True),
        "streaming_sessionize",
    )
    return tbl.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Stream-stream interval join, under the oracle
# ---------------------------------------------------------------------------


@query(
    "streaming_stream_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_seconds
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join executed by the streaming engine: a
    clicks stream inner-joins a purchases stream on user with the
    time-range condition purchase within [click, click + 1h] — the
    canonical two-feed correlation (ad click x conversion) that batch
    engines express as a range join and streaming engines as symmetric
    state with watermark eviction.

    Both sides carry a 0-second watermark; the range condition bounds
    how long each side's rows stay in state (a click can be evicted once
    the purchase-side watermark passes click_ts + 1h). Inner join output
    emits eagerly per micro-batch, so the availableNow run produces the
    COMPLETE join of the backlog — the oracle is the plain batch range
    join, no closure filtering needed (unlike append-mode aggregation in
    ``streaming_sessionize``). gap_seconds is exact integer arithmetic.
    """
    from ibc_spark.streaming.sources import read_events_stream

    clicks = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "0 seconds")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "0 seconds")
    )
    j = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("gap_seconds"),
    )
    return _run_stream_to_memory(
        spark,
        lambda name: j.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True),
        "streaming_stream_join",
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup via k-means cluster blocking
# ---------------------------------------------------------------------------

_SEMDEDUP_THRESHOLD = 0.9
# Train the k-means blocker on the vec_id % 3 == 0 hash-sample (~1/3 of the
# corpus) and bulk-encode everything with one assignment pass — the
# train-on-sample / bulk-encode production split the km_train docstring
# names (VERDICT r6 #5). Deterministic and portable, so the oracle replays
# it verbatim; planted duplicates are bit-identical vectors, so their
# assignments (and thus SemDeDup recall) are invariant to which sample
# trained the centroids.
_SEMDEDUP_SAMPLE_MOD = 3


def _semdedup_oracle() -> str:
    from ibc_spark.ext.foldspec import (
        _FOLD_B,
        _FOLD_BUCKETS,
        _FOLD_PARTIAL,
        _KM_DIM,
        _KM_K,
        _km_assign_sql,
    )
    from ibc_spark.registry_ext import _PLANT_SQL, _cos_sql

    return f"""
    WITH emb0 AS ({_PLANT_SQL}),
    emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM emb0
    ),
    trn AS (SELECT * FROM emb WHERE vec_id % {_SEMDEDUP_SAMPLE_MOD} = 0),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM trn ORDER BY vec_id LIMIT {_KM_K}),
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
    {_km_assign_sql("c1", "a2")}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cid,
           round({_cos_sql("a.v", "b.v")}, 6) AS cos_sim
    FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
    WHERE {_cos_sql("a.v", "b.v")} >= {_SEMDEDUP_THRESHOLD}
    """


@query("dedup_semdedup", oracle=_semdedup_oracle())
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dup
    pairs found by k-means CLUSTER BLOCKING — embeddings are clustered
    (two deterministic Lloyd iterations, shared with
    ``kmeans_embeddings_2iter``), and exact cosine runs only WITHIN each
    cluster, block-paired through one BLAS matmul per sub-block pair
    (`ext.similarity.gemm_threshold_pairs`).

    Scale math: candidates drop from O(n^2) to O(sum c_i^2); in the
    SemDeDup regime k grows with the corpus so cluster sizes stay
    bounded and the join is shuffle-partitioned by cid — embarrassingly
    parallel, no all-pairs stage anywhere. Duplicates land in the same
    cluster because identical vectors get identical assignments (and
    near-identical ones the same argmin for any non-degenerate centroid
    set). Input is the planted-dup table (`registry_ext._PLANT_SQL` —
    vec_id % 10 == 0 takes its successor's embedding), the same fixture
    the LSH corpus entries use: planted pairs have cos == 1.0 and no
    natural pair reaches 0.52 at oracle SF, so the 0.9 threshold is
    engine-robust: only cos==1.0 pairs are ever emitted, so BLAS-vs-fold
    rounding (<=1e-15) cannot flip the threshold comparison or a 6-dp
    rounded output. (The interpreted per-pair HOF cosine form of this
    entry measured 16 s at sf0.1; the GEMM form pays the identical
    O(sum c_i^2 * dim) flops as BLAS and bounds task memory by
    sub-block, not cluster, size.) Since round 7 the clusterer TRAINS on
    the ``vec_id % _SEMDEDUP_SAMPLE_MOD == 0`` hash-sample and bulk-encodes the full corpus
    in one pass — so centroid training state is bounded by the sample,
    independent of corpus size (planted recall is pinned unchanged in
    pytest). The oracle replays sampled training + clustering +
    within-cluster pairs in DuckDB — exact hash match.

    CORPUS-ADAPTIVE k (round 9; the ``adaptive_band_params`` pattern):
    the SemDeDup regime grows k with the corpus so CLUSTER SIZE — and
    with it the O(sum c_i^2) candidate volume — stays bounded;
    k = clamp(n/2000, _KM_K=4, 128). At every oracle SF the derived k
    is IDENTICAL to the oracle's fixed _KM_K (n=500 → 4), so the SQL
    replay is unchanged; the r9 deep sweep measured the fixed-k form
    going quadratic a decade past sf1 (4.2 s at sf1 → 99.6 s at sf10,
    clusters of 12.5k vectors) — adaptive k restores bounded clusters
    across the measured range. Output is k-invariant on this fixture
    (planted duplicates are bit-identical vectors → identical
    assignments at any k; no natural pair reaches the 0.9 threshold).
    Past the k=128 cap the remaining production lever is GEMM-blocked
    assignment + hierarchical clustering, per the SemDeDup paper."""
    from ibc_spark.ext.similarity import gemm_threshold_pairs
    from ibc_spark.registry_ext import _planted_embeddings
    from ibc_spark.registry_lakehouse import km_assign_2iter

    emb = _planted_embeddings(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    from ibc_spark.ext.foldspec import _KM_K

    # _planted_embeddings is a row-preserving left-join transform of the
    # embeddings table, so derive k from the RAW table's count — a
    # metadata-only parquet count — instead of re-running the planted
    # pipeline just to size k (ADVICE r9)
    n = read_table(spark, sf_dir, "embeddings").count()
    k = max(_KM_K, min(128, n // 2000))
    a2 = km_assign_2iter(emb, k=k, sample_mod=_SEMDEDUP_SAMPLE_MOD).select(
        "vec_id", "v", "cid"
    )
    pairs = gemm_threshold_pairs(
        a2,
        id_col="vec_id",
        vec_col="v",
        cell_col="cid",
        threshold=_SEMDEDUP_THRESHOLD,
        n_blocks=4,
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.col("cell").alias("cid"),
        F.round("cos", 6).alias("cos_sim"),
    )


# ---------------------------------------------------------------------------
# SCD2 point-in-time (as-of-version) lookup
# ---------------------------------------------------------------------------


@query(
    "scd2_point_in_time",
    oracle="""
    WITH versions AS (
      SELECT c_custkey, c_mktsegment AS seg, 1 AS version,
             DATE '1992-01-01' AS valid_from,
             DATE '1994-01-01' + CAST(c_custkey % 1000 AS INTEGER) AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, 'CHANGED', 2,
             DATE '1994-01-01' + CAST(c_custkey % 1000 AS INTEGER),
             CAST(NULL AS DATE)
      FROM customer
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           v.version AS version_at_order, v.seg AS segment_at_order
    FROM orders o
    JOIN versions v
      ON o.o_custkey = v.c_custkey
     AND o.o_orderdate >= v.valid_from
     AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
    """,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against an SCD2 version table: each order
    resolves the dimension VERSION that was valid on its order date —
    the read side of ``scd2_customer_history``'s write side, and the
    correctness backbone of any backfill (joining today's dim rows onto
    historical facts silently rewrites history).

    The version table here is synthesized deterministically (each
    customer's segment flips to 'CHANGED' at a per-key boundary date
    inside the order-date range, so both versions are actually
    exercised). Plan shape: equi join on the customer key with the
    validity range as a residual predicate — versions-per-key is small
    and bounded, so this scales exactly like any fact-dim join; never a
    range-only join. Spark's half-open interval semantics match the
    oracle's (valid_from inclusive, valid_to exclusive, NULL = open)."""
    c = read_table(spark, sf_dir, "customer")
    boundary = F.date_add(
        F.lit("1994-01-01").cast("date"), (F.col("c_custkey") % 1000).cast("int")
    )
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.lit(1).alias("version"),
        F.lit("1992-01-01").cast("date").alias("valid_from"),
        boundary.alias("valid_to"),
    )
    v2 = c.select(
        "c_custkey",
        F.lit("CHANGED").alias("seg"),
        F.lit(2).alias("version"),
        boundary.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    versions = v1.unionByName(v2)
    o = read_table(spark, sf_dir, "orders")
    j = o.join(
        versions,
        (o.o_custkey == versions.c_custkey)
        & (o.o_orderdate >= versions.valid_from)
        & (versions.valid_to.isNull() | (o.o_orderdate < versions.valid_to)),
    )
    return j.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("version").alias("version_at_order"),
        F.col("seg").alias("segment_at_order"),
    )


# ---------------------------------------------------------------------------
# Streaming exact dedup across two feeds, under the oracle
# ---------------------------------------------------------------------------


@query(
    "streaming_dedup_exact",
    oracle="SELECT DISTINCT sha256(text) AS sha FROM documents",
)
def streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-address dedup executed BY THE STREAMING ENGINE across two
    feeds: the documents stream unioned with itself (every document
    arrives twice — the re-delivery / two-source shape) then
    ``dropDuplicates`` on the SHA-256 content address. The emitted set is
    the DISTINCT address set — duplicate re-deliveries are absorbed by
    the dedup state store, which is exactly how an exactly-once ingest
    boundary absorbs at-least-once delivery at 100 TB (state is one key
    per distinct document; bound it with ``dropDuplicatesWithinWatermark``
    when addresses can expire).

    Only the address column is emitted (which PHYSICAL row wins the race
    inside the state store is nondeterministic; the address set is not),
    so the availableNow result equals the batch DISTINCT — the oracle.
    Spark's ``sha2(text, 256)`` and DuckDB's ``sha256(text)`` both emit
    lowercase hex."""
    from ibc_spark.streaming.sources import read_documents_stream

    def feed():
        return read_documents_stream(spark, sf_dir).select(
            F.sha2(F.col("text"), 256).alias("sha")
        )

    both = feed().unionByName(feed())
    deduped = both.dropDuplicates(["sha"])
    return _run_stream_to_memory(
        spark,
        lambda name: deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True),
        "streaming_dedup_exact",
    )


@query(
    "streaming_dedup_watermarked",
    oracle="SELECT DISTINCT sha256(text) AS sha FROM documents",
)
def streaming_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BOUNDED-state twin of ``streaming_dedup_exact``:
    ``dropDuplicatesWithinWatermark`` over the ingest clock, so each
    content address holds state only until the watermark passes its event
    time + 10 min — after that the key is evicted. ``dropDuplicates``
    state grows with every distinct document FOREVER (fine for an ingest
    boundary replaying a bounded backlog, fatal for a perpetual feed);
    this is the form that runs indefinitely at 100 TB, sized by the
    re-delivery horizon (how late a duplicate can arrive) instead of
    corpus cardinality.

    Same two-feed union fixture (every document arrives twice, equal
    event times): duplicates land within the watermark window and are
    absorbed, so the availableNow emission equals the batch DISTINCT —
    the oracle. Only the address is emitted (the winning physical row is
    a state-store race, the address set is not)."""
    from ibc_spark.streaming.sources import read_documents_stream

    def feed():
        return read_documents_stream(spark, sf_dir).select(
            F.sha2(F.col("text"), 256).alias("sha"), "ingest_ts"
        )

    both = feed().unionByName(feed()).withWatermark("ingest_ts", "10 minutes")
    deduped = both.dropDuplicatesWithinWatermark(["sha"]).select("sha")
    return _run_stream_to_memory(
        spark,
        lambda name: deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True),
        "streaming_dedup_watermarked",
    )


# ---------------------------------------------------------------------------
# Lexicon-based scoring (SURVEY §7.7's "sentiment-style scoring via
# broadcast lexicon join")
# ---------------------------------------------------------------------------

# Performance-sentiment lexicon over the synthetic corpus vocabulary.
_LEXICON: dict[str, int] = {"fast": 2, "small": 1, "big": -1, "slow": -2}


@query(
    "text_lexicon_score",
    oracle=f"""
    WITH lex(term, weight) AS (VALUES {", ".join(f"('{t}', {w})" for t, w in sorted(_LEXICON.items()))}),
    tok AS (
      SELECT doc_id, unnest({{toks}}) AS term,
             len({{toks}}) AS n_tokens
      FROM documents
    )
    SELECT doc_id,
           CAST(SUM(COALESCE(weight, 0)) AS BIGINT) AS score_sum,
           COUNT(weight) AS n_hits,
           CAST(SUM(COALESCE(weight, 0)) AS DOUBLE) / any_value(n_tokens)
             AS sentiment
    FROM tok LEFT JOIN lex USING (term)
    GROUP BY doc_id
    """.format(
        toks="list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
    ),
)
def text_lexicon_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based document scoring (SURVEY §7.7's sentiment-style
    scorer): tokens equi-join a BROADCAST weight lexicon; per-doc integer
    weight sum, hit count, and a length-normalized score.

    The lexicon is O(vocabulary-subset) — always broadcast, never
    shuffled; the token explode is narrow; the aggregate is map-side
    combinable on doc_id. Real deployments swap the inline VALUES for a
    dim-table read (same plan). All-integer aggregation; the single
    final division is IEEE-identical across engines."""
    from ibc_spark.ext.text import tokens

    lex = spark.createDataFrame(
        sorted(_LEXICON.items()), schema="term string, weight int"
    )
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    tok = docs.select(
        "doc_id", F.size("toks").alias("n_tokens"), F.explode("toks").alias("term")
    )
    j = tok.join(F.broadcast(lex), on="term", how="left")
    return j.groupBy("doc_id").agg(
        F.sum(F.coalesce("weight", F.lit(0))).alias("score_sum"),
        F.count("weight").alias("n_hits"),
        (
            F.sum(F.coalesce("weight", F.lit(0))).cast("double")
            / F.any_value("n_tokens")
        ).alias("sentiment"),
    )


# ---------------------------------------------------------------------------
# Market-basket association: event-type co-occurrence lift
# ---------------------------------------------------------------------------


@query(
    "basket_lift_pairs",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
    t AS (SELECT event_type, COUNT(*) AS n_type FROM u GROUP BY event_type),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM u a JOIN u b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both,
           CAST(n_both AS DOUBLE) * n_users / ta.n_type / tb.n_type AS lift
    FROM p
    JOIN t ta ON ta.event_type = p.type_a
    JOIN t tb ON tb.event_type = p.type_b
    CROSS JOIN n
    """,
)
def basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over event types: for each unordered type
    pair, the co-occurring-user count and LIFT
    (P(a,b) / (P(a)P(b)), computed as n_both * n_users / (n_a * n_b)).

    The self-join is keyed on user_id with per-user fan-out bounded by
    the TYPE cardinality (a handful), so candidate volume is O(users x
    |types|^2) — never quadratic in rows. Per-type counts are a tiny
    broadcast; the user-distinct frame is one hash aggregate. The lift
    division chain is pinned left-to-right over exact integers, so both
    engines produce bit-identical doubles."""
    ev = read_table(spark, sf_dir, "events")
    u = ev.select("user_id", "event_type").distinct()
    n = u.agg(F.countDistinct("user_id").alias("n_users"))
    t = u.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_type"))
    a = u.select("user_id", F.col("event_type").alias("type_a"))
    b = u.select("user_id", F.col("event_type").alias("type_b"))
    p = (
        a.join(b, on="user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = F.broadcast(t.select(F.col("event_type").alias("type_a"), F.col("n_type").alias("n_a")))
    tb = F.broadcast(t.select(F.col("event_type").alias("type_b"), F.col("n_type").alias("n_b")))
    return (
        p.join(ta, "type_a")
        .join(tb, "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_both",
            (
                F.col("n_both").cast("double")
                * F.col("n_users")
                / F.col("n_a")
                / F.col("n_b")
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Capstone: the training-corpus preparation funnel as ONE declarative plan
# ---------------------------------------------------------------------------


def _funnel_oracle() -> str:
    """Compose the funnel oracle from the REGISTERED oracles of its stage
    operators (gopher gate, lang-id, decontamination) so the funnel can
    never drift from the operators it chains."""
    from ibc_spark.registry_core import ORACLES

    g = ORACLES["text_gopher_rules"].strip()
    l = ORACLES["text_lang_id"].strip()
    c = ORACLES["decontaminate_against_holdout"].strip()
    return f"""
    WITH g AS (SELECT doc_id, keep FROM ({g})),
    l AS (SELECT doc_id, lang_pred FROM ({l})),
    c AS (SELECT doc_id, contaminated FROM ({c})),
    base AS (
      SELECT d.doc_id, sha256(d.text) AS sha, g.keep, l.lang_pred,
             COALESCE(c.contaminated, FALSE) AS contaminated,
             d.doc_id % 97 = 0 AS is_holdout
      FROM documents d
      JOIN g USING (doc_id)
      JOIN l USING (doc_id)
      LEFT JOIN c USING (doc_id)
    ),
    s AS (
      SELECT *,
             keep AND lang_pred = 'en' AS q3,
             CASE WHEN keep AND lang_pred = 'en'
                  THEN doc_id = min(doc_id) FILTER (keep AND lang_pred = 'en')
                       OVER (PARTITION BY sha)
                  ELSE FALSE END AS q4
      FROM base
    ),
    counts AS (
      SELECT COUNT(*) AS c1,
             COUNT(*) FILTER (keep) AS c2,
             COUNT(*) FILTER (q3) AS c3,
             COUNT(*) FILTER (q4) AS c4,
             COUNT(*) FILTER (q4 AND NOT is_holdout AND NOT contaminated) AS c5
      FROM s
    )
    SELECT stage_order, stage, docs_surviving FROM (
      SELECT 1 AS stage_order, 'raw' AS stage, c1 AS docs_surviving FROM counts
      UNION ALL SELECT 2, 'quality_gate', c2 FROM counts
      UNION ALL SELECT 3, 'english_only', c3 FROM counts
      UNION ALL SELECT 4, 'exact_dedup', c4 FROM counts
      UNION ALL SELECT 5, 'decontaminated', c5 FROM counts
    )
    """


@query("corpus_pipeline_funnel", oracle=_funnel_oracle())
def corpus_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPSTONE: the training-corpus preparation pipeline — Gopher quality
    gate -> English-only -> exact content dedup -> benchmark
    decontamination — composed as ONE declarative plan, reporting the
    survivor count after each cumulative stage (the funnel a data-curation
    run reports before a pretraining launch).

    Composition is by calling the STAGE OPERATORS themselves
    (``text_gopher_rules``, ``text_lang_id``,
    ``decontaminate_against_holdout``) and joining their outputs on
    doc_id; the oracle is assembled from those operators' REGISTERED
    oracle SQL, so funnel semantics cannot drift from the operators it
    chains. Catalyst fuses the stage projections over the shared
    documents scan; the only shuffles are the content-sha window (the
    dedup) and the decontamination hit-count — at 100 TB each stage
    stays the plan already proven by its standalone entry, and the
    funnel aggregate is a 5-row frame.

    Which stages actually drop documents depends on the corpus: at
    oracle SF the synthetic documents are all English with no exact-dup
    texts, so the quality gate and decontamination are the active
    stages; the oracle still verifies all five counts exactly."""
    from ibc_spark.registry_core import QUERIES

    g = QUERIES["text_gopher_rules"](spark, sf_dir).select("doc_id", "keep")
    lng = QUERIES["text_lang_id"](spark, sf_dir)
    con = QUERIES["decontaminate_against_holdout"](spark, sf_dir).select(
        "doc_id", "contaminated"
    )
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.sha2(F.col("text"), 256).alias("sha")
    )
    base = (
        d.join(g, "doc_id")
        .join(lng, "doc_id")
        .join(con, "doc_id", "left")
        .select(
            "doc_id",
            "sha",
            "keep",
            "lang_pred",
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
            (F.col("doc_id") % 97 == 0).alias("is_holdout"),
        )
    )
    q3 = F.col("keep") & (F.col("lang_pred") == "en")
    w = Window.partitionBy("sha")
    s = base.withColumn("q3", q3).withColumn(
        "q4",
        F.when(
            F.col("q3"),
            F.col("doc_id")
            == F.min(F.when(F.col("q3"), F.col("doc_id"))).over(w),
        ).otherwise(F.lit(False)),
    )
    counts = s.agg(
        F.count(F.lit(1)).alias("c1"),
        F.count(F.when(F.col("keep"), 1)).alias("c2"),
        F.count(F.when(F.col("q3"), 1)).alias("c3"),
        F.count(F.when(F.col("q4"), 1)).alias("c4"),
        F.count(
            F.when(F.col("q4") & ~F.col("is_holdout") & ~F.col("contaminated"), 1)
        ).alias("c5"),
    )
    stages = counts.select(
        F.expr(
            "stack(5, 1, 'raw', c1, 2, 'quality_gate', c2, 3, 'english_only', c3,"
            " 4, 'exact_dedup', c4, 5, 'decontaminated', c5)"
        ).alias("stage_order", "stage", "docs_surviving")
    )
    return stages


# ---------------------------------------------------------------------------
# Linear multi-touch attribution (complement of attribution_last_touch)
# ---------------------------------------------------------------------------


@query(
    "attribution_linear",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, event_id AS click_id, ts AS c_ts
      FROM events WHERE event_type = 'click'
    ),
    j AS (
      SELECT p.purchase_id, p.user_id, c.click_id
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.c_ts <= p.p_ts AND c.c_ts > p.p_ts - INTERVAL 1 HOUR
    )
    SELECT purchase_id, user_id, click_id,
           COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches,
           CAST(1 AS DOUBLE) / COUNT(*) OVER (PARTITION BY purchase_id)
             AS credit
    FROM j
    """,
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution: every click in the hour before a
    purchase shares the credit equally (1/n) — the fairness-spread
    counterpart of ``attribution_last_touch``'s winner-takes-all.

    Same join shape as last-touch (user-keyed equi join with an hour-band
    range residual — never a time-only join), then one window count per
    purchase; credit is a single division of exact integers, so doubles
    match DuckDB bit-for-bit. Purchases with zero preceding clicks have
    no credit rows by definition (INNER join) on both engines."""
    ev = read_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    j = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ts <= p.p_ts)
        & (c.c_ts > p.p_ts - F.expr("INTERVAL 1 HOUR")),
    )
    w = Window.partitionBy("purchase_id")
    return j.select(
        "purchase_id",
        "user_id",
        "click_id",
        F.count(F.lit(1)).over(w).alias("n_touches"),
        (F.lit(1).cast("double") / F.count(F.lit(1)).over(w)).alias("credit"),
    )


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users (sliding distinct — the op sketches exist for)
# ---------------------------------------------------------------------------


@query(
    "rolling_7d_distinct_users",
    oracle="""
    WITH days AS (
      SELECT date_trunc('day', ts) + INTERVAL (o) DAY AS day, user_id
      FROM events, generate_series(0, 6) t(o)
    ),
    bounds AS (
      SELECT min(date_trunc('day', ts)) AS d0, max(date_trunc('day', ts)) AS d1
      FROM events
    )
    SELECT CAST(day AS DATE) AS day,
           COUNT(DISTINCT user_id) AS distinct_users_7d
    FROM days, bounds
    WHERE day BETWEEN d0 AND d1
    GROUP BY 1
    """,
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day DISTINCT users per day — the sliding-distinct
    aggregate that plain windows cannot express (COUNT(DISTINCT) OVER a
    RANGE frame is unsupported everywhere) and the textbook motivation
    for mergeable HLL sketches (`sketch_hll_mergeable`): store per-day
    sketches, union 7 on read.

    This EXACT form pays the explode instead: each event contributes its
    user to the 7 window-days it falls in (a bounded 7x row fan-out,
    narrow, no Python), then one distinct aggregate per day. At 100 TB
    the fan-out factor is the window length — fine at 7, the sketch path
    takes over at 90+. Days beyond the observed range are clipped so
    every reported day aggregates a full in-range window."""
    ev = read_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("d"), "user_id"
    )
    bounds = ev.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    offsets = F.array(*[F.lit(o) for o in range(7)])
    days = ev.select(
        F.explode(offsets).alias("o"), "d", "user_id"
    ).select(
        F.col("d") + F.make_interval(days=F.col("o")), "user_id"
    ).toDF("day", "user_id")
    return (
        days.crossJoin(F.broadcast(bounds))
        .where(F.col("day").between(F.col("d0"), F.col("d1")))
        .groupBy(F.col("day").cast("date").alias("day"))
        .agg(F.countDistinct("user_id").alias("distinct_users_7d"))
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (LISTAGG / string_agg parity)
# ---------------------------------------------------------------------------


@query(
    "listagg_priorities_by_status",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
             AS priorities,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def listagg_priorities_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered LISTAGG: the distinct priorities per order status as one
    sorted comma-joined string — the SQL `string_agg(... ORDER BY)` /
    `LISTAGG WITHIN GROUP` surface. Spark has no ordered string_agg
    aggregate, so the deterministic spelling is collect_set ->
    array_sort -> array_join (any per-group collection order collapses
    to the same sorted result). Distinct-set size is bounded by the
    priority domain, so the collected arrays are tiny regardless of
    group size."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), ","
        ).alias("priorities"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


# ---------------------------------------------------------------------------
# Schema-evolution union (allowMissingColumns)
# ---------------------------------------------------------------------------


@query(
    "union_evolved_snapshots",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(NULL AS VARCHAR) AS o_orderpriority, 1 AS snapshot_ver
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE), o_orderpriority, 2
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def union_evolved_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two snapshot generations of the same table
    carry DIFFERENT column sets (v1 has the price, v2 dropped it and
    added the comment); ``unionByName(allowMissingColumns=True)``
    reconciles by NAME and null-fills what each side lacks — the read
    path every long-lived lakehouse table needs, and the failure mode
    positional UNION silently corrupts (columns lining up by index, not
    meaning). The oracle spells out the explicit NULL-cast form the
    engine generates."""
    o = read_table(spark, sf_dir, "orders")
    v1 = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.lit(1).alias("snapshot_ver"),
    )
    v2 = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.lit(2).alias("snapshot_ver"),
    )
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority",
        "snapshot_ver",
    )


# ---------------------------------------------------------------------------
# CDC snapshot diff (change-data-feed classification between table states)
# ---------------------------------------------------------------------------


@query(
    "cdc_snapshot_diff",
    oracle="""
    WITH v_old AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(12,2)) AS price
      FROM orders WHERE o_orderkey % 7 <> 0
    ),
    v_new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             CAST(o_totalprice AS DECIMAL(12,2))
               + CASE WHEN o_orderkey % 5 = 0 THEN CAST(1 AS DECIMAL(12,2))
                      ELSE CAST(0 AS DECIMAL(12,2)) END AS price
      FROM orders WHERE o_orderkey % 11 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.price IS DISTINCT FROM n.price THEN 'update'
                ELSE 'unchanged' END AS change_type,
           n.o_orderstatus AS new_status,
           CAST(n.price AS DOUBLE) AS new_price
    FROM v_old o
    FULL OUTER JOIN v_new n USING (o_orderkey)
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two table snapshots: a keyed FULL OUTER
    join classifies every key as insert / delete / update / unchanged
    (null-safe value comparison via ``IS DISTINCT FROM`` — the change
    feed Delta/Iceberg CDF emits, derived here from states alone). The
    two synthetic snapshot views carve deterministic inserts (keys
    divisible by 7, absent from v_old), deletes (divisible by 11) and
    updates (divisible by 5, status+price changed) out of the same
    orders scan.

    One shuffle on the key for the full outer join; comparisons are
    codegen; at 100 TB both snapshots bucket by key and the join is
    shuffle-free. Exact DECIMAL price arithmetic keeps the update
    classification and the output values engine-identical."""
    o = read_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(12,2)")
    v_old = o.where(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("old_status"),
        price.alias("old_price"),
    )
    bump = F.when(F.col("o_orderkey") % 5 == 0, F.lit(1)).otherwise(
        F.lit(0)
    ).cast("decimal(12,2)")
    v_new = o.where(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("new_status"),
        (price + bump).cast("decimal(12,2)").alias("new_price"),
    )
    j = v_old.join(v_new, "o_orderkey", "full_outer")
    return j.select(
        "o_orderkey",
        F.when(F.col("old_status").isNull() & F.col("old_price").isNull(), "insert")
        .when(F.col("new_status").isNull() & F.col("new_price").isNull(), "delete")
        .when(
            ~F.col("old_status").eqNullSafe(F.col("new_status"))
            | ~F.col("old_price").eqNullSafe(F.col("new_price")),
            "update",
        )
        .otherwise("unchanged")
        .alias("change_type"),
        "new_status",
        F.col("new_price").cast("double").alias("new_price"),
    )


# ---------------------------------------------------------------------------
# Deterministic argmax (struct-max — the safe spelling of max_by)
# ---------------------------------------------------------------------------


@query(
    "argmax_order_per_customer",
    oracle="""
    WITH m AS (
      SELECT o_custkey,
             max({'p': CAST(o_totalprice AS DECIMAL(12,2)), 'k': o_orderkey})
               AS m
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, (m).k AS best_orderkey,
           CAST((m).p AS DOUBLE) AS best_price
    FROM m
    """,
)
def argmax_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer argmax (the most expensive order) via STRUCT-MAX:
    ``max(struct(price, key))`` compares lexicographically, so the unique
    key inside the struct makes ties deterministic — the safe spelling of
    ``max_by``/``arg_max``, whose bare forms are free to return ANY
    tied row on both engines. One hash aggregate with map-side partials
    (cheaper than the row_number-window spelling, which must shuffle and
    sort every row); exact DECIMAL price inside the comparison and one
    cast out."""
    o = read_table(spark, sf_dir, "orders")
    m = o.groupBy("o_custkey").agg(
        F.max(
            F.struct(
                F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
                F.col("o_orderkey").alias("k"),
            )
        ).alias("m")
    )
    return m.select(
        "o_custkey",
        F.col("m.k").alias("best_orderkey"),
        F.col("m.p").cast("double").alias("best_price"),
    )


def _streaming_kmv_oracle() -> str:
    from ibc_spark.ext.foldspec import kmv_estimate_sql, kmv_hash_sql
    from ibc_spark.registry_ext_sketch import _KMV_K

    est = kmv_estimate_sql(
        "count(*)", f"max(CASE WHEN rn = {_KMV_K} THEN uh END)", _KMV_K
    )
    return f"""
    WITH h AS (
      SELECT event_type, {kmv_hash_sql('user_id')} AS uh
      FROM events WHERE user_id IS NOT NULL
    ),
    kmv AS (
      SELECT event_type, uh,
             row_number() OVER (PARTITION BY event_type ORDER BY uh) AS rn
      FROM (SELECT DISTINCT event_type, uh FROM h)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_in_state,
           round({est}, 4) AS approx_users
    FROM kmv WHERE rn <= {_KMV_K} GROUP BY event_type
    """


@query("streaming_sketch_kmv", oracle=_streaming_kmv_oracle())
def streaming_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL STREAMING SKETCH — the `applyInPandasWithState`
    face of the portable KMV family, and the streaming shape the built-in
    windowed aggs cannot express (a streaming COUNT DISTINCT holds every
    id in state; the sketch holds exactly k longs per key forever):
    per event_type, state = the k smallest distinct 60-bit md5 user
    hashes, updated by set-union + re-take-k per micro-batch. The merge
    is order- and batch-split-insensitive, so the final state equals the
    batch-computed global k-min EXACTLY and the batch KMV SQL is the
    oracle for a real streaming run (availableNow over the backlog,
    update mode, in-memory sink; last emission per key selected by the
    (n_in_state, approx_users) sort key, which is monotone across
    batches by construction). Estimate rounding happens in F.round —
    the engines' shared HALF_UP — never Python's banker's round."""
    from ibc_spark.streaming.sources import read_events_stream
    from ibc_spark.streaming.stateful import kmv_state_update, kmv_stream_schemas
    from ibc_spark.registry_ext_sketch import _KMV_K

    state_schema, out_schema = kmv_stream_schemas()
    ev = read_events_stream(spark, sf_dir)
    from ibc_spark.ext.foldspec import kmv_hash

    h = ev.where(F.col("user_id").isNotNull()).select(
        "event_type", kmv_hash(F.col("user_id")).alias("uh")
    ).where(F.col("uh").isNotNull())
    from pyspark.sql.streaming.state import GroupStateTimeout

    upd = h.groupBy("event_type").applyInPandasWithState(
        kmv_state_update(_KMV_K),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    tbl = _run_stream_to_memory(
        spark,
        lambda name: upd.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True),
        "streaming_sketch_kmv",
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("n_in_state").desc(), F.col("approx_users").desc()
    )
    return (
        tbl.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            "n_in_state",
            F.round("approx_users", 4).alias("approx_users"),
        )
    )
