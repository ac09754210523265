"""Full-registry empirical scale audit: time EVERY registry entry once at
sf0.1 and once at sf1 (10x) and report the per-entry ratio. One run per
point (this is a triage scan, not the 3-run-median sweep — suspicious
entries get re-measured by ``scale_sweep.py``). Results stream to stdout
as JSONL so a hang loses nothing.

Run: ``python scripts/scan_all_sf1.py [start_idx]`` (start_idx resumes an
interrupted scan by skipping the first N entries alphabetically).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

def _sf_dir(name: str) -> str:
    driver = f"/root/testdata/{name}"
    return driver if os.path.isdir(driver) else os.path.join(HERE, ".scale", name)


# override with e.g. IBC_SCAN_SFS=sf1,sf10
SFS = [
    (name, _sf_dir(name))
    for name in os.environ.get("IBC_SCAN_SFS", "sf0.1,sf1").split(",")
]


def main() -> None:
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    from ibc_spark.ext.persistreg import release_persisted
    from ibc_spark.io_.sources import read_table
    from ibc_spark.registry import QUERIES
    from ibc_spark.session import get_spark

    names = sorted(QUERIES)[start:]
    results: dict[str, dict[str, float]] = {}
    for sf_name, sf_dir in SFS:
        spark = get_spark(f"scan_all_{sf_name}")
        read_table(spark, sf_dir, "nation").count()
        # one warmup query so JVM/codegen cost doesn't land on entry #1
        QUERIES["flagship_revenue_by_nation"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        for name in names:
            t0 = time.perf_counter()
            try:
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
            except Exception as exc:  # record, keep scanning
                dt = -1.0
                print(
                    json.dumps({"entry": name, "sf": sf_name, "error": str(exc)[:200]}),
                    flush=True,
                )
            finally:
                release_persisted()
                spark.catalog.clearCache()
            results.setdefault(name, {})[sf_name] = round(dt, 3)
            print(json.dumps({"entry": name, "sf": sf_name, "sec": round(dt, 3)}), flush=True)
        spark.stop()
    lo, hi = SFS[0][0], SFS[-1][0]
    out = {
        n: {
            **v,
            "ratio": (
                round(v[hi] / v[lo], 2)
                if v.get(lo, 0) > 0 and v.get(hi, 0) > 0
                else None
            ),
        }
        for n, v in results.items()
    }
    print(json.dumps({"scan": out}), flush=True)


if __name__ == "__main__":
    main()
