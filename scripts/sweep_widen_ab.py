"""A/B the r15 widen constants at sf1 (VERDICT r15 #6): re-validate
``widen_for_arrow_chain``'s quarter width (none / 8 / 32) on two audio
entries and ``widen_for_compute``'s full width (none / 8 / 32) on one
video entry, at a scale 10× the bench corpus. The r15 constants were
tuned on sf0.1; this sweep answers whether the quarter-width choice
still wins when each partition carries ~1500 rows instead of ~150.

Monkeypatches the helpers at their USE sites (registry_ext_pipe binds
the names at import), fresh session per variant, bench discipline.

Run: ``python scripts/sweep_widen_ab.py`` → JSON on stdout; save to
``bench_records/sweep_r16_widen_ab_sf1.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

AUDIO = ["multimodal_audio_stereo_adpcm", "multimodal_audio_mulaw"]
VIDEO = ["multimodal_video_mjpeg"]
SF_DIR = os.path.join(HERE, ".scale", "sf1")
RUNS = max(1, int(os.environ.get("BENCH_RUNS", "3")))


def _variant(width: int | None):
    """A widen function: None → identity; n → repartition-if-narrower."""

    def widen(df):
        if width is None:
            return df
        if df.rdd.getNumPartitions() < width:
            return df.repartition(width)
        return df

    return widen


def main() -> None:
    import ibc_spark.registry_ext_pipe as pipe
    from ibc_spark.ext.persistreg import release_checkpoints, release_persisted
    from ibc_spark.io_.sources import read_table
    from ibc_spark.registry import QUERIES
    from ibc_spark.session import get_spark

    results: dict[str, dict[str, float]] = {}
    for label, width in [("none", None), ("w8", 8), ("w32", 32)]:
        spark = get_spark(f"widen_ab_{label}")
        read_table(spark, SF_DIR, "nation").count()
        import ibc_spark.ext.dedup as dd

        orig_chain = pipe.widen_for_arrow_chain
        orig_comp = pipe.widen_for_compute
        orig_dd_chain = dd.widen_for_arrow_chain
        orig_dd_comp = dd.widen_for_compute
        pipe.widen_for_arrow_chain = _variant(width)
        pipe.widen_for_compute = _variant(width)
        # some entries import the helper function-locally from ext.dedup
        # (multimodal_video_mjpeg) — patch the source module too, else
        # that arm silently runs production width (the r16 first-run bug:
        # its 'variants' differed only by noise)
        dd.widen_for_arrow_chain = _variant(width)
        dd.widen_for_compute = _variant(width)
        try:
            for name in AUDIO + VIDEO:
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
            pipe.widen_for_arrow_chain = orig_chain
            pipe.widen_for_compute = orig_comp
            dd.widen_for_arrow_chain = orig_dd_chain
            dd.widen_for_compute = orig_dd_comp
            spark.stop()
    print(json.dumps({"sf": "sf1", "runs": RUNS, "results": results}))


if __name__ == "__main__":
    main()
