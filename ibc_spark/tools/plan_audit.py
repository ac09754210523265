"""Mechanical physical-plan audit over EVERY registry entry.

Operationalizes the per-round hand audit: build each registry query's
physical plan (no execution) and flag the anti-patterns that kill 100 TB
runs. Run as a module for a human report::

    python -m ibc_spark.tools.plan_audit [sf_dir]

or through ``tests/test_plans.py::test_repo_wide_plan_audit``, which
asserts the violation set stays inside the DOCUMENTED allowlist — new
operators cannot silently introduce a cartesian join or a row-at-a-time
Python UDF without either fixing it or adding an explicit, justified
allowlist entry here.

Rules:

- ``CartesianProduct`` — never acceptable; a cross join that matters at
  scale must become an equi-join (grid cells, banding, blocking).
- ``BroadcastNestedLoopJoin`` — acceptable ONLY for 1-row scalar frames
  (count/total broadcasts); every such entry is allowlisted with the
  reason, anything else is a bug.
- ``BatchEvalPython`` — row-at-a-time Python UDF; the engine's rule is
  Arrow-batched (``ArrowEvalPython`` / ``MapInPandas``) or nothing.
"""

from __future__ import annotations

# BroadcastNestedLoopJoin allowlist: entry -> why the BNLJ is correct.
# Every entry here joins a 1-row (or few-row, plan-time bounded) frame —
# the scalar-broadcast pattern, not a quadratic join.
BNLJ_ALLOWED: dict[str, str] = {
    "scalar_subquery_big_spenders": "1-row global-average scalar broadcast",
    "mix_temperature_weights": "1-row normalizer total broadcast",
    "q11_important_parts": "1-row global-value HAVING scalar broadcast",
    "q14_promo_revenue_pct": "1-row denominator broadcast",
    "q22_idle_rich_customers": "1-row average-balance scalar broadcast",
    "text_bigram_pmi": "two 1-row totals (n_bigrams, n_tokens) broadcasts",
    "lm_bigram_logprob": "1-row vocabulary-size broadcast",
    "corpus_datacard": "single-row aggregate output",
    "job_summary_metrics": "1-row valid x 1-row invalid count frames",
    "drift_source_mix_kl": "two 1-row snapshot-total broadcasts",
    "vocab_coverage_curve": "1-row total-term-count broadcast",
    "docs_length_trim_percentile": "per-source cutoff frame joined to ~20 sources",
    "dq_expectations_orders": "single-row expectations aggregate",
    "histogram_order_values": "1-row min/max bounds broadcast",
    "anomaly_mad_event_volume": "1-row median/MAD scalar broadcasts",
    "q2_min_cost_supplier": "correlated-min decorrelated to a bounded join",
    "knn_graph_topk": "packed-block crossJoin: n_blocks(=8) rows per side by construction",
    "ann_range_search": "1-row query-vector broadcast (docstringed contract)",
    "ann_topk_bruteforce": "bounded query-set broadcast with non-equi self-exclusion — the brute-force baseline by definition",
    "bm25_keyword_search": "1-row corpus-stats (N, avgdl) broadcast",
    "incremental_rollup_merge": "1-row incremental-cutoff broadcast",
    "tfidf_top_terms": "1-row corpus-size broadcast for the IDF term",
    "zorder_layout_events": "1-row min/max quantization-bounds broadcast",
    "kmeans_embeddings_2iter": "O(k*dim) centroid frame broadcast per assignment pass",
    "sample_diverse_per_cluster": "same O(k*dim) centroid broadcast as kmeans_embeddings_2iter (shared km_assign helper)",
    "drift_quality_psi": "1-row corpus-total broadcast into the PSI term projection",
    "sample_contrastive_triplets": "inherits the gold/negative arms' bounded query-set broadcasts (ann_topk_bruteforce and sample_hard_negatives, both standalone-allowlisted); the assembly join is O(queries*k) rows",
    "ann_topk_ivf_portable": "O(k*dim) centroid frame broadcast for query-probe ranking (shared km_train/km_assign machinery); candidate join is hash equi on cell",
    "graph_pagerank_trade": "1-row node-count + 1-row dangling-mass broadcasts per iteration",
    "graph_pagerank_shuffled": "1-row node-count + 1-row dangling-mass broadcasts per iteration (the RANK joins are hinted shuffle-hash — asserted in test_plans)",
    "graph_triangle_count": "final summary row: crossJoin of four 1-row count frames",
    "graph_khop_reachability": "1-row per-hop frontier-size/summary broadcasts (frontier join itself is hash equi)",
    "embedding_power_iteration_pc1": "1-row norm / Rayleigh-quotient scalar broadcasts per pass",
    "heavy_hitters_exact": "1-row global-count broadcast into the HAVING predicate",
    "sketch_kmv_setops": "crossJoin of four 1-row estimate/exact aggregate frames into the single summary row",
    "heavy_hitters_cms": "1-row global-count broadcast into the threshold predicate",
    "dedup_semdedup": "O(k*dim) centroid broadcast (shared km_assign_2iter); pair join itself is hash equi on cid",
    "basket_lift_pairs": "1-row distinct-user-count broadcast into the lift expression",
    "embedding_pq_encode": "16-row codebook-anchor frame broadcast (O(K) by construction)",
    "ann_topk_pq_adc": "16-row anchor frame + 1-row query vector + 128-row ADC table broadcasts",
    "rolling_7d_distinct_users": "1-row observed-day-range bounds broadcast (window clipping)",
    "search_hybrid_rrf": "inherits the bm25 arm's 1-row corpus-stats broadcast and the dense arm's 1-row query-vector broadcast (both standalone-allowlisted); fusion join is two ≤20-row top-k frames",
    "sample_hard_negatives": "bounded query-set broadcast with non-equi self-exclusion — the same shape as ann_topk_bruteforce; band filter precedes the per-query top-k",
    "profile_cross_source_overlap": "#sources x #sources sketch-pair join over O(k)-array rows — a bounded dimension frame (20 rows/side), the corpus itself is scanned once",
    "eval_retrieval_metrics": "inherits the gold arm's bounded query-set broadcast (ann_topk_bruteforce, standalone-allowlisted); the eval join itself is O(queries*k) rows",
    "ann_topk_lsh": "attestation surface: inherits the gold arm's bounded query-set broadcast (ann_topk_bruteforce shape); LSH arm itself is hash equi on (tab, bucket)",
    "ann_topk_ivf": "attestation surface: gold/full-probe arms' bounded query-set broadcasts + final 1-row x 1-row summary crossJoin",
    "knn_graph_lsh": "attestation surface: exact arm is the allowlisted packed-block crossJoin (knn_graph_topk shape; query-sample blocks x corpus blocks past the inert-modulus regime)",
    "dedup_minhash_lsh": "attestation surface: crossJoin of 1-row doc-count / pair-count / invariant aggregate frames into the single summary row",
    "sketch_hll_mergeable": "attestation surface: 1-row merged-estimate x 1-row global-exact crossJoin for the ALL row",
    "sketch_kll_mergeable": "attestation surface: 1-row merged-quantile x 1-row global-exact crossJoin for the ALL row",
    "sketch_theta_setops": "attestation surface: 1-row estimate x 1-row exact-union x 1-row exact-intersection crossJoins for the setop rows",
    "eval_dedup_metrics": "eval surface: 1-row sample-doc-count x 1-row metrics aggregate crossJoin",
    "mix_dedup_aware_weights": "inherits the overlap matrix's bounded source-pair join + a 1-row weight-total broadcast",
    "vocab_bpe_train_merges": "one 1-row selected-merge broadcast per BPE iteration (3 total), folded into the vocabulary-sized word histogram",
    "vocab_bpe_apply_compression": "inherits the training loop's per-iteration 1-row merge broadcasts (vocab_bpe_train_merges, standalone-allowlisted); the corpus-side apply join is hash equi on term",
}

# Row-at-a-time Python allowlist: the engine-wide rule is Arrow-batched or
# nothing — the ONE exception is the UDTF API-parity demo, whose docstring
# itself says "NOT the hot path" (the same result is a built-in explode).
PYEVAL_ALLOWED: dict[str, str] = {
    "udtf_explode_words": "UDTF surface demo; docstring declares it off the hot path",
}

RULES = (
    ("CartesianProduct", "cartesian product", set()),
    ("BroadcastNestedLoopJoin", "nested-loop join (only 1-row scalar frames allowed)", set(BNLJ_ALLOWED)),
    ("BatchEvalPython", "row-at-a-time Python UDF (Arrow-batched only)", set(PYEVAL_ALLOWED)),
)


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def audit_entry(name: str, df) -> list[str]:
    """Violations for one entry's physical plan."""
    plan = plan_of(df)
    out = []
    for marker, why, allowed in RULES:
        if marker in plan and name not in allowed:
            out.append(f"{marker}: {why}")
    return out


def audit_all(spark, sf_dir: str, names=None) -> dict[str, list[str]]:
    """name -> violations for every (or the given) registry entries.
    Entries whose plan cannot even be BUILT are reported as
    ``plan_error: ...`` — an entry must never crash at plan time."""
    from ibc_spark.registry import QUERIES

    report: dict[str, list[str]] = {}
    for name in names or sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf_dir)
            violations = audit_entry(name, df)
        except Exception as exc:  # noqa: BLE001 — audit must cover all entries
            violations = [f"plan_error: {str(exc)[:160]}"]
        if violations:
            report[name] = violations
    return report


def main() -> int:
    import json
    import sys

    from ibc_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit", shuffle_partitions=8)
    report = audit_all(spark, sf_dir)
    print(json.dumps(report, indent=2))
    return 1 if report else 0


if __name__ == "__main__":
    raise SystemExit(main())
