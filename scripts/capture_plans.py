"""Capture .explain("formatted") for a set of registry entries into
plans/<tag>/<name>_<suffix>.txt — the optimization-round evidence files.

Usage: python scripts/capture_plans.py <tag> <suffix> name1,name2,...
Streaming entries (writeStream-driven) cannot be explained without
running; for those the batch-equivalent plan of the same transformation
chain is captured when the registry exposes one, else they are skipped
with a note.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ibc_spark.registry import QUERIES  # noqa: E402
from ibc_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix, names_csv = sys.argv[1], sys.argv[2], sys.argv[3]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [n.strip() for n in names_csv.split(",") if n.strip()]
    out_dir = os.path.join("plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("ibc_spark_plans")
    for name in names:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            import contextlib
            import io

            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # streaming sinks etc.
            plan = f"(not explainable without execution: {type(exc).__name__}: {exc})\n"
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path, file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
