"""Local replica of the driver's Spark-vs-DuckDB comparison.

Stricter than the driver (exact value equality, not a hash) so that
anything green here is green in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime
import math


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0 / 0.0
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "as_integer_ratio") and not isinstance(v, (int, float)):
        return float(v)  # Decimal
    return v


def normalize_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return cols, out


def spark_result(df):
    return normalize_rows(df.columns, [tuple(r) for r in df.collect()])


def duck_result(con, sql: str):
    cur = con.sql(sql)
    return normalize_rows(list(cur.columns), cur.fetchall())


def assert_parity(name: str, df, con, sql: str) -> None:
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duck_result(con, sql)
    assert s_cols == [c.lower() for c in d_cols] or s_cols == d_cols, (
        f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"{name}: row {i} differs\n spark={a}\n duck ={b}"
