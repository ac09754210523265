"""Local replica of the driver's Spark-vs-DuckDB comparison.

Stricter than the driver (exact value equality, not a hash) so that
anything green here is green in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime
import math
import re


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


def _duck_type_to_spark(t: str) -> str:
    """Canonicalize a DuckDB type name to the Spark simpleString it should
    pair with under the driver's typed hash. HUGEINT (int128) deliberately
    maps to itself — Spark has no equivalent, so any oracle producing it
    (un-cast SUM over integers) fails loudly here instead of at the driver."""
    t = t.strip()
    if t.endswith("[]"):
        return f"array<{_duck_type_to_spark(t[:-2])}>"
    u = t.upper()
    if u.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    simple = {
        "TINYINT": "tinyint",
        "SMALLINT": "smallint",
        "INTEGER": "int",
        "BIGINT": "bigint",
        "UBIGINT": "HUGEINT",  # unsigned 64-bit also exceeds Spark LONG
        "HUGEINT": "HUGEINT",
        "FLOAT": "float",
        "REAL": "float",
        "DOUBLE": "double",
        "VARCHAR": "string",
        "BOOLEAN": "boolean",
        "DATE": "date",
        "TIMESTAMP": "timestamp",
        "TIMESTAMP WITH TIME ZONE": "timestamp",
        "BLOB": "binary",
    }
    return simple.get(u, t.lower())


def _canon_type(t: str) -> str:
    """Collapse type distinctions the driver's pandas/arrow conversion also
    collapses: all signed integer widths <= 64 become int64, and Spark's
    timestamp_ntz pairs with DuckDB's naive TIMESTAMP. HUGEINT survives —
    DuckDB converts int128 to float64, which the driver's typed hash sees
    as a mismatch against any Spark integer."""
    t = re.sub(r"\b(tinyint|smallint|bigint|int)\b", "i64", t)
    return t.replace("timestamp_ntz", "timestamp")


def normalize_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return cols, out


def spark_result(df):
    cols, rows = normalize_rows(df.columns, [tuple(r) for r in df.collect()])
    types = {f.name: _canon_type(f.dataType.simpleString()) for f in df.schema.fields}
    return cols, rows, [types[c] for c in cols]


def duck_result(con, sql: str):
    cur = con.sql(sql)
    names = list(cur.columns)
    type_by_name = {
        n: _canon_type(_duck_type_to_spark(str(t))) for n, t in zip(names, cur.types)
    }
    cols, rows = normalize_rows(names, cur.fetchall())
    return cols, rows, [type_by_name[c] for c in cols]


def assert_parity(name: str, df, con, sql: str) -> None:
    s_cols, s_rows, s_types = spark_result(df)
    d_cols, d_rows, d_types = duck_result(con, sql)
    assert s_cols == [c.lower() for c in d_cols] or s_cols == d_cols, (
        f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    )
    # Type-strict: the driver hashes typed values, so an int-width or
    # decimal-vs-double difference fails there even when values repr-match.
    assert s_types == d_types, (
        f"{name}: type mismatch (per sorted column {s_cols})\n"
        f" spark={s_types}\n duck ={d_types}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"{name}: row {i} differs\n spark={a}\n duck ={b}"
