"""Quick local parity runner for a subset of registry entries.

Usage: python scripts/parity_check.py name1 name2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from ibc_spark.session import get_spark  # noqa: E402

SF = os.environ.get("IBC_SF_ORACLE", "/root/testdata/sf0.01")


def main(names: list[str]) -> int:
    from ibc_spark.registry import ORACLES, QUERIES

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from tests.parity import assert_parity

    spark = get_spark()
    duck = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        duck.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF}/{name}.parquet'")
    failed = []
    for name in names:
        t0 = time.time()
        try:
            df = QUERIES[name](spark, SF)
            assert_parity(name, df, duck, ORACLES[name])
            print(f"OK   {name}  ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            msg = str(e)
            print(f"FAIL {name}: {msg[:2000]}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
