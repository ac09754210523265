"""Generate a synthetic sf1 dataset (10x sf0.1) for the scale sweep.

The driver ships sf{0.001,0.01,0.1}; the 100 TB argument needs at least one
measured point beyond sf0.1 (VERDICT r7 #5), so this script replicates
sf0.1 tenfold into ``<repo>/.scale/sf1/`` (gitignored) with per-replica
transformations chosen so the STRUCTURE scales linearly instead of
degenerating:

- ``documents``: per-replica injective letter substitution
  (``translate(text, 'abcdefghij', rotation_i)``) — token/shingle COUNTS
  and every within-replica Jaccard are preserved exactly (equal shingles
  iff equal pre-image), while cross-replica shingles diverge, so near-dup
  pair counts scale x10, not x100 (replicated identical text would pair
  every copy with every other copy).
- ``embeddings``: per-replica cyclic dimension shift — within-replica
  cosines are preserved exactly (same permutation on both sides of every
  dot product), cross-replica cosines decorrelate, so planted-dup
  clusters scale x10.
- ``events`` / TPC-H tables: key offsets make each replica a disjoint
  id-space (disjoint users, orders, customers, suppliers), preserving
  per-entity distributions — group counts scale x10 at constant group
  size, the same shape real corpus growth has.

Run: ``python scripts/gen_scale_sf.py`` (~seconds, DuckDB).
"""

from __future__ import annotations

import os

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DST = os.path.join(HERE, ".scale", "sf1")
R = 10  # replicas

ALPHA = "abcdefghij"
ROTS = "[" + ", ".join(f"'{ALPHA[i:] + ALPHA[:i]}'" for i in range(R)) + "]"


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def gen(table: str, select: str) -> None:
        out = os.path.join(DST, f"{table}.parquet")
        con.execute(
            f"""
            COPY (
              SELECT {select}
              FROM read_parquet('{SRC}/{table}.parquet') t
              CROSS JOIN range({R}) r(i)
            ) TO '{out}' (FORMAT PARQUET)
            """
        )
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows -> {out}", flush=True)

    gen(
        "documents",
        f"""doc_id + r.i*10000000 AS doc_id,
            CASE WHEN r.i = 0 THEN text
                 ELSE translate(text, '{ALPHA}', {ROTS}[r.i + 1]) END AS text,
            lang, source, n_chars""",
    )
    gen(
        "embeddings",
        """vec_id + r.i*10000000 AS vec_id,
           CAST(list_concat(embedding[r.i+1:], embedding[:r.i]) AS FLOAT[])
             AS embedding,
           label""",
    )
    gen(
        "events",
        """event_id + r.i*1000000000 AS event_id, ts,
           user_id + r.i*10000000 AS user_id, event_type, value, props""",
    )
    gen(
        "orders",
        """o_orderkey + r.i*100000000 AS o_orderkey,
           o_custkey + r.i*10000000 AS o_custkey,
           o_orderstatus, o_totalprice, o_orderdate, o_orderpriority""",
    )
    gen(
        "lineitem",
        """l_orderkey + r.i*100000000 AS l_orderkey,
           l_partkey + r.i*10000000 AS l_partkey,
           l_suppkey + r.i*1000000 AS l_suppkey,
           l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
           l_returnflag, l_linestatus, l_shipdate""",
    )
    gen(
        "customer",
        """c_custkey + r.i*10000000 AS c_custkey,
           c_name || '-r' || r.i AS c_name,
           c_nationkey, c_acctbal, c_mktsegment""",
    )
    gen(
        "supplier",
        """s_suppkey + r.i*1000000 AS s_suppkey,
           s_name || '-r' || r.i AS s_name,
           s_nationkey, s_acctbal""",
    )
    # small dims copied verbatim (the sweep's warmup reads nation)
    for t in ("nation", "region", "part"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{os.path.join(DST, t + '.parquet')}' (FORMAT PARQUET)"
        )
        print(f"{t}: copied", flush=True)


if __name__ == "__main__":
    main()
