from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = os.environ.get("IBC_SF_SMOKE", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("IBC_SF_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from ibc_spark.session import get_spark

    s = get_spark("ibc_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def empty_sf(spark):
    """An sf dir whose documents/embeddings/events/orders tables exist but
    hold 0 rows — the first-run / fully-filtered case every scheduled
    pipeline eventually hits (shared by the r9/r10 degenerate-input
    suites)."""
    import tempfile

    tmp = tempfile.mkdtemp(prefix="ibc_empty_sf_")
    docs = spark.createDataFrame(
        [], "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    emb = spark.createDataFrame(
        [], "vec_id: long, embedding: array<float>, label: string"
    )
    emb.write.mode("overwrite").parquet(os.path.join(tmp, "embeddings.parquet"))
    ev = spark.createDataFrame(
        [],
        "event_id: long, ts: timestamp, user_id: long, event_type: string,"
        " value: double, props: string",
    )
    ev.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    o = spark.createDataFrame(
        [],
        "o_orderkey: long, o_custkey: long, o_orderstatus: string,"
        " o_totalprice: double, o_orderdate: date, o_orderpriority: string",
    )
    o.write.mode("overwrite").parquet(os.path.join(tmp, "orders.parquet"))
    return tmp


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_ORACLE}/{name}.parquet'"
        )
    yield con
    con.close()
