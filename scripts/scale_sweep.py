"""Scale sweep: measure time-vs-sf exponents for the structural entries
(VERDICT r7 #5 — the 100 TB argument rested on plan shape alone; this adds
the empirical point beyond sf0.1).

Runs each entry at sf0.01 / sf0.1 / sf1 (sf1 from ``gen_scale_sf.py``,
10x sf0.1 with similarity-preserving per-replica transforms) under the
bench harness discipline (noop materialize, release_persisted +
clearCache between runs, median of BENCH_RUNS), then fits the per-decade
scaling exponent  e = log10(t_sf1 / t_sf0.1).  e <= ~1 is linear; the
0.01 -> 0.1 decade is reported too but is dominated by fixed overhead at
these sizes (sub-second queries), so the 0.1 -> 1 decade is the signal.

Run: ``python scripts/scale_sweep.py [entry ...]`` -> JSON on stdout,
progress on stderr.

STREAMING CAVEAT (r10): sweep streaming entries with ONE SF per process
(IBC_SWEEP_SFS=sf10 ...). The per-SF session restart (spark.stop() + new
SparkContext in the same JVM) leaves RocksDB state-store maintenance
threads pointed at the DEAD StateStoreCoordinator endpoint; a heavy
streaming catch-up batch in the third session then crawls on ~2 cores
(observed: sf10 sessionize hung >11 min vs 57 s in a fresh process).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

ENTRIES = [
    # banded near-dup family: candidate volume rides the band equi-join
    "dedup_minhash_verified",
    "dedup_minhash_lsh_portable",
    # linear hash/probe baselines
    "dedup_exact_content_sha",
    "decontaminate_bloom",
    # cluster-blocked semantic dedup (fixed k=4 -> clusters grow with the
    # corpus; production scaling keeps cluster size bounded by k ~ n/c)
    "dedup_semdedup",
    # bucketed ANN probe at fixed query count
    "ann_topk_lsh_portable",
    # node-scale iterative graph (three shuffles per iteration)
    "graph_pagerank_shuffled",
    # sessionization: per-user windows over disjoint users
    "interval_overlap_sessions",
    # directed containment: inverted-index count join (quadratic risk rides
    # the per-shingle co-occurrence volume)
    "dedup_ngram_containment",
    # stride-1 window explode (the most row-intensive dedup input shape)
    "dedup_duplicate_spans",
    # per-(doc,term) count shuffle + exact DECIMAL fold
    "text_token_entropy",
    # daily k-min sketches + lossless merge
    "sketch_kmv_rollup_merge",
]

def _sf_dir(name: str) -> str:
    driver = f"/root/testdata/{name}"
    return driver if os.path.isdir(driver) else os.path.join(HERE, ".scale", name)


# override with e.g. IBC_SWEEP_SFS=sf0.1,sf1,sf3,sf10 (sf3/sf10 from
# gen_scale_sfn.py carry documents/embeddings only — sweep text/ANN
# entries there, not the TPC-H/events families)
SFS = [
    (name, _sf_dir(name))
    for name in os.environ.get("IBC_SWEEP_SFS", "sf0.01,sf0.1,sf1").split(",")
]


def main() -> None:
    names = sys.argv[1:] or ENTRIES
    runs = max(1, int(os.environ.get("BENCH_RUNS", "3")))
    from ibc_spark.ext.persistreg import release_checkpoints, release_persisted
    from ibc_spark.io_.sources import read_table
    from ibc_spark.registry import QUERIES
    from ibc_spark.session import get_spark

    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf_name, sf_dir in SFS:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_name}: {sf_dir} missing", file=sys.stderr)
            continue
        # fresh session per SF: no cross-SF cache/heap contamination
        spark = get_spark(f"scale_sweep_{sf_name}")
        read_table(spark, sf_dir, "nation").count()
        for name in names:
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
                release_persisted()
                # free local-checkpoint blocks too (suffix rounds):
                # invisible to DataFrame unpersist, they OOMed the
                # 8g heap by the third back-to-back sf3 entry (r12)
                release_checkpoints(spark)
                spark.catalog.clearCache()
            samples.sort()
            med = samples[len(samples) // 2]
            results[name][sf_name] = round(med, 3)
            print(f"{sf_name} {name}: {med:.2f}s", file=sys.stderr)
        spark.stop()

    sf_value = {"sf0.01": 0.01, "sf0.1": 0.1, "sf1": 1.0, "sf3": 3.0, "sf10": 10.0}
    for name, r in results.items():
        if "sf1" in r and "sf0.1" in r and r["sf0.1"] > 0:
            r["exp_01_to_1"] = round(math.log10(r["sf1"] / r["sf0.1"]), 2)
        if "sf0.1" in r and "sf0.01" in r and r["sf0.01"] > 0:
            r["exp_001_to_01"] = round(math.log10(r["sf0.1"] / r["sf0.01"]), 2)
        if "sf10" in r and "sf1" in r and r["sf1"] > 0:
            r["exp_1_to_10"] = round(math.log10(r["sf10"] / r["sf1"]), 2)
        elif "sf3" in r and "sf1" in r and r["sf1"] > 0:
            # half-decade fallback, normalized per decade
            r["exp_1_to_3"] = round(
                math.log10(r["sf3"] / r["sf1"]) / math.log10(3.0), 2
            )
    load = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps({"results": results, "runs": runs, "load_avg": load}))


if __name__ == "__main__":
    main()
