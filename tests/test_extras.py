"""Tests for ibc_spark.registry_extras: streaming-under-oracle, heavy
hitters (exact + Count-Min), semi-join reduction, truncated EWMA."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ibc_spark.registry import QUERIES

from .conftest import SF_ORACLE, SF_SMOKE
from .test_plans import plan_of


def test_streaming_rollup_matches_batch_face(spark):
    """The streaming twin must equal the batch entry on the shared columns
    (the batch face carries an extra n_users; distinct aggs are unsupported
    in streaming)."""
    stream = QUERIES["streaming_hourly_rollup"](spark, SF_SMOKE)
    batch = QUERIES["events_hourly_rollup"](spark, SF_SMOKE).select(
        "window_start", "event_type", "n_events", "total_value"
    )
    assert stream.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream).count() == 0


def test_streaming_rollup_reruns_are_stable(spark):
    """Each invocation spins a fresh memory sink + checkpoint; result must
    be identical run-over-run (the bench runs every entry 3x)."""
    a = QUERIES["streaming_hourly_rollup"](spark, SF_SMOKE)
    b = QUERIES["streaming_hourly_rollup"](spark, SF_SMOKE)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_cms_superset_and_bounds(spark):
    """CMS never undercounts: est >= exact for every candidate, the
    thresholded answer is a superset of the exact heavy hitters, and the
    overestimate stays within the classic 4n/w bound (4 independent rows,
    each E[err] <= n/w)."""
    from ibc_spark.registry_extras import _CMS_WIDTH

    exact = {
        r.user_id: r.n_events
        for r in QUERIES["heavy_hitters_exact"](spark, SF_ORACLE).collect()
    }
    cms_rows = QUERIES["heavy_hitters_cms"](spark, SF_ORACLE).collect()
    cms = {r.user_id: (r.est_count, r.exact_count) for r in cms_rows}
    assert set(exact) <= set(cms)
    # true n recomputed independently of the entry
    from ibc_spark.io_.sources import read_table

    n = read_table(spark, SF_ORACLE, "events").count()
    for uid, (est, ex) in cms.items():
        assert est >= ex, (uid, est, ex)
        assert est - ex <= 4 * n / _CMS_WIDTH, (uid, est, ex)
    for uid, ex in exact.items():
        assert cms[uid][1] == ex


def test_cms_sketch_is_mergeable(spark):
    """Summing two half-sketches cell-wise equals the whole-input sketch —
    the property that makes per-day sketch storage + merge-on-read work."""
    from ibc_spark.io_.sources import read_table
    from ibc_spark.registry_extras import _CMS_DEPTH, _CMS_WIDTH, _cms_bases, _cms_pos

    ev = read_table(spark, SF_SMOKE, "events")

    def sketch_of(df):
        parts = []
        h1, h2 = _cms_bases(F.col("user_id"))
        for r in range(_CMS_DEPTH):
            parts.append(
                df.select(
                    F.lit(r).alias("row"),
                    _cms_pos(h1, h2, F.lit(r), _CMS_WIDTH).alias("col"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))

    whole = sketch_of(ev)
    lo = sketch_of(ev.where(F.col("event_id") % 2 == 0))
    hi = sketch_of(ev.where(F.col("event_id") % 2 == 1))
    merged = (
        lo.unionByName(hi)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_semi_reduction_plan_shape(spark):
    """The broadcast semi join (the reduction) must sit BELOW the main join:
    lineitem rows are filtered before any shuffle moves them."""
    df = QUERIES["join_semi_reduced"](spark, SF_SMOKE)
    plan = plan_of(df)
    semi = plan.find("BroadcastHashJoin")
    assert semi != -1, plan
    assert "LeftSemi" in plan
    # the semi join feeds the main join's build/probe side, not vice versa:
    # the LeftSemi detail block must reference the lineitem scan directly
    left_semi_block = plan.split("LeftSemi")[0]
    assert "lineitem" in left_semi_block or "l_orderkey" in plan


def test_dynamic_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """Writing the fact partitioned by the join key's natural dimension
    and joining through a selective dim filter must inject a dynamic
    partition pruning subquery — the partition-level analogue of the
    runtime bloom filter, and the reason partitioned layouts matter: at
    100 TB the scan then reads only the partitions the dim filter
    selects, decided at RUNTIME."""
    from ibc_spark.io_.sources import read_table

    part_dir = str(tmp_path / "events_by_type")
    read_table(spark, SF_SMOKE, "events").write.partitionBy("event_type").mode(
        "overwrite"
    ).parquet(part_dir)
    fact = spark.read.parquet(part_dir)
    # the dim filter must NOT be statically derivable from the join key
    # (a literal event_type predicate would propagate through the equi
    # join as a constraint and prune STATICALLY — also correct, but then
    # no runtime filter is needed); an aggregate-derived predicate forces
    # the runtime path
    dim = (
        read_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 150)
        .select("event_type")
    )
    # broadcast path: DPP reuses the broadcast result as the filter
    j = fact.join(F.broadcast(dim), "event_type").groupBy("event_type").count()
    plan = plan_of(j)
    assert "dynamicpruning" in plan.lower(), plan
    assert "PartitionFilters" in plan, plan


def test_runtime_bloom_filter_injects_on_reduction_shape(spark):
    """Spark's own runtime bloom filter (the implicit form of the same
    reduction) injects might_contain on this join shape once thresholds
    allow — proving the conf-only scale path works on our plan."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # creationSideThreshold is a MAX (creation side must be small enough
        # to sketch) — the default 10MB already admits the filtered orders;
        # applicationSideScanSizeThreshold is a MIN (the scan must be big
        # enough to be worth filtering) — drop it so sf0.001 qualifies.
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # injection only targets PROBABLE SHUFFLE joins; at sf0.001 both
        # sides are under the auto-broadcast threshold, so Spark classifies
        # the join as broadcast (which needs no runtime filter). At 100 TB
        # the sides exceed the threshold naturally — emulate that here.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        from ibc_spark.io_.sources import read_table

        li = read_table(spark, SF_SMOKE, "lineitem")
        o = read_table(spark, SF_SMOKE, "orders").where(
            (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000)
        )
        # plain join (no explicit semi reduction, no hints)
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = plan_of(j.groupBy("o_orderpriority").count())
        assert "might_contain" in plan.lower() or "bloomfilter" in plan.lower(), plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_sliding_rollup_covers_each_event_twice(spark):
    """2h windows hopping 1h: every event lands in exactly two windows, so
    the window-level event counts sum to exactly 2x the table count."""
    from ibc_spark.io_.sources import read_table

    df = QUERIES["events_sliding_rollup"](spark, SF_SMOKE)
    total = df.agg(F.sum("n_events")).collect()[0][0]
    n = read_table(spark, SF_SMOKE, "events").count()
    assert total == 2 * n


def test_streaming_sessionize_is_closed_subset_of_batch(spark):
    """The streaming result must be exactly the batch sessions whose window
    (last_ts + gap) the watermark has passed — nothing more, nothing less."""
    from pyspark.sql import Window

    from ibc_spark.io_.sources import read_table

    got = QUERIES["streaming_sessionize"](spark, SF_SMOKE)
    b = read_table(spark, SF_SMOKE, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    marked = b.withColumn(
        "ns",
        F.when(
            prev.isNull() | (F.col("ts") >= prev + F.expr("INTERVAL 30 MINUTES")), 1
        ).otherwise(0),
    )
    num = marked.withColumn(
        "seq", F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    sess = num.groupBy("user_id", "seq").agg(
        F.min("ts").alias("session_start"),
        (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    mx = b.agg(F.max("ts").alias("m"))
    closed = (
        sess.crossJoin(F.broadcast(mx))
        .where(F.col("session_end") <= F.col("m"))
        .select("user_id", "session_start", "session_end", "n_events")
    )
    assert closed.exceptAll(got).count() == 0
    assert got.exceptAll(closed).count() == 0
    # the withheld tail sessions are real: batch has strictly more
    assert sess.count() > closed.count()


def test_stream_stream_join_equals_batch_range_join(spark):
    """Inner stream-stream join emits eagerly, so availableNow must equal
    the batch range join exactly — no watermark closure filtering."""
    from ibc_spark.io_.sources import read_table

    got = QUERIES["streaming_stream_join"](spark, SF_SMOKE)
    ev = read_table(spark, SF_SMOKE, "events")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    batch = (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("gap_seconds"),
        )
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
    assert got.count() > 0


def test_gemm_threshold_pairs_invariant_to_block_count(spark):
    """The within-cell pair set must not depend on the sub-block split
    (each unordered pair exactly once, any n_blocks), and must equal the
    interpreted exact-cosine reference."""
    from ibc_spark.ext.dedup import cosine
    from ibc_spark.ext.similarity import gemm_threshold_pairs
    from ibc_spark.io_.sources import read_table

    emb = read_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        (F.col("vec_id") % 3).alias("cell"),
    )
    thr = 0.15  # low enough that natural pairs exist at sf0.001
    ref_a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "cell"
    )
    ref_b = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "cell")
    ref = (
        ref_a.join(ref_b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cosine(F.col("va"), F.col("vb")) >= thr)
        .select("id_a", "id_b")
    )
    expected = {(r.id_a, r.id_b) for r in ref.collect()}
    assert expected, "fixture should produce at least one pair"
    for n_blocks in (1, 3, 7):
        got = gemm_threshold_pairs(
            emb,
            id_col="vec_id",
            vec_col="v",
            cell_col="cell",
            threshold=thr,
            n_blocks=n_blocks,
        )
        rows = got.collect()
        pairs = [(r.id_a, r.id_b) for r in rows]
        assert len(pairs) == len(set(pairs)), f"duplicate pairs at n_blocks={n_blocks}"
        assert set(pairs) == expected, f"pair set differs at n_blocks={n_blocks}"
        assert all(r.id_a < r.id_b for r in rows)


def test_semdedup_finds_every_planted_pair(spark):
    """Cluster blocking must not lose a single planted duplicate: all
    (10k, 10k+1) pairs appear with cos == 1.0, and nothing else crosses
    the 0.9 threshold on this fixture."""
    rows = QUERIES["dedup_semdedup"](spark, SF_ORACLE).collect()
    got = {(r.id_a, r.id_b) for r in rows}
    from ibc_spark.io_.sources import read_table

    n = read_table(spark, SF_ORACLE, "embeddings").count()
    planted = {(i, i + 1) for i in range(0, n, 10) if i + 1 < n}
    assert got == planted
    assert all(r.cos_sim == 1.0 for r in rows)


def test_pq_encode_invariants(spark):
    """Every vector gets 8 codes in [0,16); the anchor vectors themselves
    encode with zero quantization error (their own subvectors are in the
    codebook)."""
    from ibc_spark.registry_ext_pq import _PQ_K, _PQ_SUBSPACES

    rows = QUERIES["embedding_pq_encode"](spark, SF_SMOKE).collect()
    from ibc_spark.io_.sources import read_table

    n = read_table(spark, SF_SMOKE, "embeddings").count()
    assert len(rows) == n
    by_id = {r.vec_id: r for r in rows}

    def codes(r):
        return [int(c) for c in r.codes_csv.split(",")]

    for r in rows:
        assert len(codes(r)) == _PQ_SUBSPACES
        assert all(0 <= c < _PQ_K for c in codes(r)), r.vec_id
        assert r.quant_err >= 0
    anchor_ids = sorted(by_id)[:_PQ_K]
    for rank, vid in enumerate(anchor_ids):
        assert by_id[vid].quant_err == 0.0, vid
        assert codes(by_id[vid]) == [rank] * _PQ_SUBSPACES, vid


def test_pq_trained_improves_on_anchor_codebook(spark):
    """Training must buy something: aggregate quantization error with
    Lloyd-trained subspace codebooks strictly below the anchor codebook's;
    codes stay in range; output is deterministic run-over-run."""
    from ibc_spark.registry_ext_pq import _PQ_K, _PQ_SUBSPACES

    trained = QUERIES["embedding_pq_trained"](spark, SF_SMOKE).collect()
    anchor = QUERIES["embedding_pq_encode"](spark, SF_SMOKE).collect()
    assert len(trained) == len(anchor)
    for r in trained:
        cs = [int(c) for c in r.codes_csv.split(",")]
        assert len(cs) == _PQ_SUBSPACES
        assert all(0 <= c < _PQ_K for c in cs)
        assert r.quant_err >= 0
    err_t = sum(r.quant_err for r in trained)
    err_a = sum(r.quant_err for r in anchor)
    assert err_t < err_a, (err_t, err_a)
    again = {r.vec_id: (r.codes_csv, r.quant_err) for r in
             QUERIES["embedding_pq_trained"](spark, SF_SMOKE).collect()}
    assert {r.vec_id: (r.codes_csv, r.quant_err) for r in trained} == again


def test_adc_topk_matches_numpy_recomputation(spark):
    """End-to-end mechanical check: recompute codes, ADC table, and top-10
    in NumPy from the raw embeddings; the Spark result must agree exactly
    (ids, ranks, and distances to 1e-9)."""
    import numpy as np

    from ibc_spark.io_.sources import read_table
    from ibc_spark.registry_ext_pq import _PQ_K, _PQ_SUBDIM, _PQ_SUBSPACES

    got = {
        r.rk: (r.vec_id, r.approx_dist_r)
        for r in QUERIES["ann_topk_pq_adc"](spark, SF_SMOKE).collect()
    }
    rows = sorted(
        (r.vec_id, np.array(r.v, dtype=np.float64))
        for r in read_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .collect()
    )
    ids = [i for i, _ in rows]
    mat = np.stack([v for _, v in rows])
    anchors = mat[:_PQ_K]  # lowest vec_ids sort first
    sub = lambda m, s: m[:, s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM]
    q = mat[ids.index(0)]
    adist = {}
    for i, vid in enumerate(ids):
        if vid == 0:
            continue
        total = 0.0
        for s in range(_PQ_SUBSPACES):
            d = ((sub(mat, s)[i] - sub(anchors, s)) ** 2).sum(axis=1)
            code = int(np.argmin(d))  # ties break to lowest rank, matching SQL
            qd = ((q[s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM] - sub(anchors, s)[code]) ** 2).sum()
            total += qd
        adist[vid] = total
    expect = sorted(adist.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    for rk, (vid, dist) in enumerate(expect, start=1):
        gvid, gdist = got[rk]
        assert gvid == vid, (rk, gvid, vid)
        assert gdist == pytest.approx(round(dist, 6), abs=1e-9)


def test_attribution_linear_credit_sums_to_one(spark):
    """Per purchase, linear credits must sum to exactly 1, and the touch
    set must equal last-touch's candidate window."""
    rows = QUERIES["attribution_linear"](spark, SF_ORACLE).collect()
    from collections import defaultdict

    sums: dict = defaultdict(float)
    for r in rows:
        sums[r.purchase_id] += r.credit
        assert r.credit == pytest.approx(1.0 / r.n_touches)
    assert rows, "expected at least one attributed purchase at oracle SF"
    for pid, s in sums.items():
        assert s == pytest.approx(1.0), pid


def test_funnel_monotone_and_consistent_with_stages(spark):
    """Funnel counts must be monotone non-increasing, start at the corpus
    size, and agree with the standalone stage operators."""
    rows = {
        r.stage: r.docs_surviving
        for r in QUERIES["corpus_pipeline_funnel"](spark, SF_ORACLE).collect()
    }
    order = ["raw", "quality_gate", "english_only", "exact_dedup", "decontaminated"]
    vals = [rows[s] for s in order]
    assert all(a >= b for a, b in zip(vals, vals[1:])), vals
    from ibc_spark.io_.sources import read_table

    assert vals[0] == read_table(spark, SF_ORACLE, "documents").count()
    keep = (
        QUERIES["text_gopher_rules"](spark, SF_ORACLE)
        .where(F.col("keep"))
        .count()
    )
    assert vals[1] == keep
    assert vals[-1] < vals[0]  # something was actually dropped


def test_scd2_pit_exactly_one_version_per_order(spark):
    """Every order must resolve exactly ONE version, and version 2 exactly
    when the order date is on/after that customer's boundary."""
    from ibc_spark.io_.sources import read_table

    df = QUERIES["scd2_point_in_time"](spark, SF_SMOKE)
    n_orders = read_table(spark, SF_SMOKE, "orders").count()
    assert df.count() == n_orders
    assert df.select("o_orderkey").distinct().count() == n_orders
    import datetime

    for r in df.limit(200).collect():
        boundary = datetime.date(1994, 1, 1) + datetime.timedelta(
            days=int(r.o_custkey % 1000)
        )
        od = r.o_orderdate.date() if hasattr(r.o_orderdate, "date") else r.o_orderdate
        expect = 2 if od >= boundary else 1
        assert r.version_at_order == expect, (r.o_orderkey, od, boundary)
        assert (r.segment_at_order == "CHANGED") == (expect == 2)


def test_streaming_dedup_absorbs_redelivery(spark):
    """The doubled feed (every doc arrives twice) must collapse to the
    batch DISTINCT address set."""
    from ibc_spark.io_.sources import read_table

    got = QUERIES["streaming_dedup_exact"](spark, SF_SMOKE)
    batch = (
        read_table(spark, SF_SMOKE, "documents")
        .select(F.sha2(F.col("text"), 256).alias("sha"))
        .distinct()
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0


def test_lexicon_score_pinned_example(spark):
    """Hand-check one synthetic doc: score must equal the weighted token
    sum over the {fast:+2, small:+1, big:-1, slow:-2} lexicon."""
    from ibc_spark.registry_extras import _LEXICON

    rows = QUERIES["text_lexicon_score"](spark, SF_SMOKE).collect()
    from ibc_spark.io_.sources import read_table

    texts = {
        r.doc_id: r.text
        for r in read_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    for r in rows[:20]:
        toks = [t for t in texts[r.doc_id].lower().split() if t]
        expect_sum = sum(_LEXICON.get(t, 0) for t in toks)
        expect_hits = sum(1 for t in toks if t in _LEXICON)
        assert r.score_sum == expect_sum, r.doc_id
        assert r.n_hits == expect_hits, r.doc_id
        assert r.sentiment == pytest.approx(expect_sum / len(toks))


def test_basket_lift_bounded_candidates(spark):
    """The pair join must fan out per user by TYPE cardinality, not rows:
    every output pair is an unordered distinct-type pair, and lift matches
    a hand computation from the contingency counts."""
    from ibc_spark.io_.sources import read_table

    rows = QUERIES["basket_lift_pairs"](spark, SF_SMOKE).collect()
    ev = read_table(spark, SF_SMOKE, "events").select("user_id", "event_type").distinct()
    by_user: dict = {}
    for r in ev.collect():
        by_user.setdefault(r.user_id, set()).add(r.event_type)
    n_users = len(by_user)
    from collections import Counter

    type_c: Counter = Counter()
    pair_c: Counter = Counter()
    for types in by_user.values():
        for t in types:
            type_c[t] += 1
        ts = sorted(types)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                pair_c[(ts[i], ts[j])] += 1
    got = {(r.type_a, r.type_b): (r.n_both, r.lift) for r in rows}
    assert set(got) == set(pair_c)
    for (a, b), (n_both, lift) in got.items():
        assert n_both == pair_c[(a, b)]
        assert lift == pytest.approx(
            n_both * n_users / (type_c[a] * type_c[b])
        )


def test_ewma_matches_reference_convolution(spark):
    """Pin the EWMA semantics against a NumPy reference computed per user
    over the same (ts, event_id) ordering."""
    import numpy as np

    from ibc_spark.io_.sources import read_table
    from ibc_spark.registry_extras import _EWMA_K

    got = {
        r.event_id: r.ewma_value
        for r in QUERIES["ewma_user_values"](spark, SF_SMOKE).collect()
    }
    pdf = (
        read_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for _, grp in pdf.groupby("user_id"):
        cents = np.round(grp["value"].to_numpy(), 2) * 100
        cents = cents.round().astype(np.int64)
        for t in range(len(grp)):
            acc = 0
            for j in range(_EWMA_K):
                if t - j >= 0:
                    acc += int(cents[t - j]) * (2 ** (_EWMA_K - 1 - j))
            expect = acc / (100 * 2**_EWMA_K)
            eid = grp["event_id"].iloc[t]
            assert got[eid] == pytest.approx(expect, abs=1e-9), eid


def test_ewma_single_window_plan(spark):
    """All 16 taps must compile into ONE Window node (one shuffle on
    user_id), not sixteen."""
    df = QUERIES["ewma_user_values"](spark, SF_SMOKE)
    plan = plan_of(df)
    from .test_plans import n_nodes

    assert n_nodes(plan, "Window") == 1, plan
    assert plan.count("Exchange") <= 2, plan
