"""Executor-side DB-API upsert sink (K1-K5 write face) round-tripped against
SQLite: insert, keyed upsert, constraint violation -> E001 quarantine rows."""

from __future__ import annotations

import functools
import sqlite3

import pytest

from ibc_spark.io_.sinks import dbapi_upsert, jdbc_writer, upsert_sql

DDL = """
CREATE TABLE users (
  user_id INTEGER PRIMARY KEY,
  email TEXT NOT NULL UNIQUE,
  name TEXT NOT NULL
);
CREATE TABLE users__quarantine (
  error_code TEXT, reason TEXT, source_row TEXT
);
"""


def connect(path: str):
    conn = sqlite3.connect(path, timeout=30)
    conn.execute("PRAGMA busy_timeout = 30000")
    return conn


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "sink.db")
    conn = sqlite3.connect(path)
    conn.executescript(DDL)
    conn.commit()
    conn.close()
    return path


def fetchall(path, sql):
    conn = sqlite3.connect(path)
    try:
        return conn.execute(sql).fetchall()
    finally:
        conn.close()


def test_upsert_sql_shape():
    sql = upsert_sql("t", ["k", "a", "b"], ["k"])
    assert sql == (
        'INSERT INTO "t" ("k", "a", "b") VALUES (?, ?, ?) '
        'ON CONFLICT ("k") DO UPDATE SET "a" = excluded."a", "b" = excluded."b"'
    )
    assert "%s" in upsert_sql("t", ["k"], ["k"], paramstyle="format")
    assert upsert_sql("t", ["k"], ["k"]).endswith("DO NOTHING")


def test_upsert_reserved_word_columns(spark, tmp_path):
    """Reserved-word column names ('order') must work via identifier quoting."""
    path = str(tmp_path / "rw.db")
    conn = sqlite3.connect(path)
    conn.execute('CREATE TABLE t (k INTEGER PRIMARY KEY, "order" TEXT)')
    conn.commit()
    conn.close()
    df = spark.createDataFrame([(1, "first")], "k long, order string")
    dbapi_upsert(
        df, table="t", key_cols="k", connection_factory=functools.partial(connect, path)
    )
    assert fetchall(path, "SELECT * FROM t") == [(1, "first")]


def test_insert_then_upsert(spark, db):
    factory = functools.partial(connect, db)
    first = spark.createDataFrame(
        [(1, "a@x.edu", "Alice"), (2, "b@x.edu", "Bob")],
        "user_id long, email string, name string",
    )
    dbapi_upsert(first, table="users", key_cols="user_id", connection_factory=factory)
    assert sorted(fetchall(db, "SELECT * FROM users")) == [
        (1, "a@x.edu", "Alice"),
        (2, "b@x.edu", "Bob"),
    ]

    # upsert: row 1 updated in place, row 3 inserted; parallel partitions
    second = spark.createDataFrame(
        [(1, "a@x.edu", "Alice Updated"), (3, "c@x.edu", "Cara")],
        "user_id long, email string, name string",
    ).repartition(2)
    dbapi_upsert(second, table="users", key_cols="user_id", connection_factory=factory)
    assert sorted(fetchall(db, "SELECT * FROM users")) == [
        (1, "a@x.edu", "Alice Updated"),
        (2, "b@x.edu", "Bob"),
        (3, "c@x.edu", "Cara"),
    ]


def test_constraint_violation_quarantines_e001(spark, db):
    factory = functools.partial(connect, db)
    df = spark.createDataFrame(
        [(1, "a@x.edu", "Alice"), (2, "b@x.edu", None), (3, "c@x.edu", "Cara")],
        "user_id long, email string, name string",
    ).coalesce(1)
    dbapi_upsert(
        df,
        table="users",
        key_cols="user_id",
        connection_factory=factory,
        quarantine_table="users__quarantine",
    )
    # good rows landed; the NOT NULL violation became an E001 quarantine row
    assert len(fetchall(db, "SELECT * FROM users")) == 2
    [(code, reason, payload)] = fetchall(db, "SELECT * FROM users__quarantine")
    assert code == "E001"
    assert "NOT NULL" in reason.upper() or "null" in reason.lower()
    assert '"user_id": 2' in payload


def test_constraint_violation_without_quarantine_fails_job(spark, db):
    factory = functools.partial(connect, db)
    df = spark.createDataFrame(
        [(1, "a@x.edu", None)], "user_id long, email string, name string"
    )
    with pytest.raises(Exception, match="E001|DataConflict"):
        dbapi_upsert(df, table="users", key_cols="user_id", connection_factory=factory)


def test_key_column_validation(spark, db):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError, match="key columns"):
        dbapi_upsert(
            df, table="users", key_cols="nope", connection_factory=lambda: None
        )


def test_jdbc_writer_configures(spark):
    df = spark.createDataFrame([(1,)], "a long")
    w = jdbc_writer(
        df, "jdbc:postgresql://h/db", "users", batchsize=512, properties={"user": "u"}
    )
    assert w is not None  # configured writer; .save() needs a driver jar
