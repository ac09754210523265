"""Every registry query with an oracle must match DuckDB exactly at the
driver's correctness scale factor (sf0.01 by default)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.parity import assert_parity


def _names():
    from ibc_spark.registry import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    return sorted(ORACLES)


@pytest.mark.parametrize("name", _names())
def test_oracle_parity(spark, duck, name):
    from ibc_spark.registry import ORACLES, QUERIES

    df = QUERIES[name](spark, SF_ORACLE)
    assert_parity(name, df, duck, ORACLES[name])


def test_oracled_entries_emit_scalar_columns_only(spark):
    """The driver's comparator canonicalizes scalar cells only — a list/
    map/struct output column crashes it (r3: `unhashable type: 'list'`).
    Array-valued results must serialize on the query surface
    (array_join/to_json), like dedup_simhash's members_csv and the PQ
    entries' codes_csv."""
    from ibc_spark.registry import ORACLES, QUERIES

    offenders = {}
    for name in sorted(ORACLES):
        if name.startswith("streaming_"):
            # invoking a streaming entry RUNS its availableNow query —
            # several seconds each for a schema-only check, and each
            # streaming entry's schema is already exercised by its own
            # parity test in this same session
            continue
        df = QUERIES[name](spark, SF_ORACLE)
        bad = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if bad:
            offenders[name] = bad
    assert offenders == {}, offenders


def test_all_queries_return_rows(spark):
    from ibc_spark.registry import QUERIES

    for name, fn in QUERIES.items():
        df = fn(spark, SF_ORACLE)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns


import os

import pytest as _pytest


@_pytest.mark.skipif(
    not os.environ.get("IBC_CROSS_SF"),
    reason="cross-SF sweep doubles suite runtime; set IBC_CROSS_SF=1 to run "
    "(verified green for all oracled entries in round 6)",
)
@_pytest.mark.parametrize("name", _names())
def test_oracle_parity_cross_sf(spark, name):
    """Same parity check at a DIFFERENT scale factor (sf0.001) — catches
    oracle constants or plans that only hold at the driver's sf0.01."""
    import duckdb

    from ibc_spark.registry import ORACLES, QUERIES

    sf = os.environ.get("IBC_SF_CROSS", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders "
        "lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    assert_parity(name, QUERIES[name](spark, sf), con, ORACLES[name])
