"""A/B the r16 widen width for the ANN/sketch pandas-UDF paths at sf0.1:
none / quarter(8) / full(32). These kernels are LIGHT per row (signature
projection, cell assignment, cosine) — the r15 audio lesson says full
core width can lose to quarter width on 3-stage Arrow chains because
batches shrink below vector-kernel amortization. Decides the constant
for similarity.py's widen sites.

Run: python scripts/sweep_ann_widen_ab.py → JSON on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

NAMES = [
    "ann_topk_ivf",
    "ann_topk_lsh",
    "knn_graph_lsh",
    "dedup_semdedup",
    "profile_cross_source_overlap",
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = max(1, int(os.environ.get("BENCH_RUNS", "5")))


def _variant(width):
    def widen(df):
        if width is None:
            return df
        if df.rdd.getNumPartitions() < width:
            return df.repartition(width)
        return df

    return widen


def main() -> None:
    import ibc_spark.ext.dedup as dd
    import ibc_spark.ext.similarity as sim
    from ibc_spark.ext.persistreg import release_checkpoints, release_persisted
    from ibc_spark.io_.sources import read_table
    from ibc_spark.registry import QUERIES
    from ibc_spark.session import get_spark

    results: dict[str, dict[str, float]] = {}
    for label, width in [("none", None), ("w8", 8), ("w32", 32)]:
        spark = get_spark(f"ann_widen_{label}")
        read_table(spark, SF_DIR, "nation").count()
        origs = (sim.widen_for_compute, dd.widen_for_compute)
        sim.widen_for_compute = _variant(width)
        dd.widen_for_compute = _variant(width)
        try:
            for name in NAMES:
                samples = []
                for _ in range(RUNS):
                    t0 = time.perf_counter()
                    QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    samples.append(time.perf_counter() - t0)
                    release_persisted()
                    release_checkpoints(spark)
                    spark.catalog.clearCache()
                samples.sort()
                med = round(samples[len(samples) // 2], 3)
                results.setdefault(name, {})[label] = med
                print(f"{label} {name}: {med:.2f}s", file=sys.stderr)
        finally:
            sim.widen_for_compute, dd.widen_for_compute = origs
            spark.stop()
    print(json.dumps({"sf": SF_DIR, "runs": RUNS, "results": results}))


if __name__ == "__main__":
    main()
