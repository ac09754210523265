"""Generate synthetic sf3 / sf10 TEXT-BEARING tables for the deep scale
sweep (VERDICT r8 #4 — extend the exponent table one decade past sf1).

Replicates sf0.1 ``documents`` and ``embeddings`` R× into
``<repo>/.scale/sf{N}/`` (gitignored) with per-replica transformations
that keep the STRUCTURE linear, exactly like ``gen_scale_sf.py`` — but
generalized past 10 replicas, where that script's 10 letter-rotations
and 64 dimension-shifts would repeat and create cross-replica duplicate
explosions (replica i and i+10 sharing a transform would pair every doc
with its own copy — quadratic pair growth the real corpus doesn't have):

- ``documents``: per-replica INJECTIVE letter permutation (seeded
  ``random.Random(42)`` shuffles of a-z, re-drawn until pairwise
  distinct ON THE USED ALPHABET) — token/shingle counts and all
  within-replica Jaccards are preserved exactly; cross-replica shingles
  diverge for every replica pair.
- ``embeddings``: per-replica orthogonal transform — cyclic dimension
  shift (i % 64) composed with a global sign flip for i >= 64 (128
  distinct transforms). Within-replica cosines are preserved exactly
  (same orthogonal map on both sides of every dot product);
  cross-replica same-base-vector pairs land at decorrelated (different
  shift) or negated (same shift, different flip) cosine — never a
  planted near-dup.
- small dims (nation/region/part) copied so the sweep warmup works.

Run: ``python scripts/gen_scale_sfn.py 3`` or ``... 10`` (DuckDB, seconds).
"""

from __future__ import annotations

import os
import random
import string
import sys

import duckdb

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
ALPHA = string.ascii_lowercase
DIM = 64


def distinct_permutations(n: int, used_alphabet: str) -> list[str]:
    """n injective a-z maps, pairwise distinct restricted to the letters
    the corpus actually uses (identity for replica 0)."""
    rng = random.Random(42)
    perms: list[str] = [ALPHA]
    seen = {"".join(c for c in ALPHA if c in used_alphabet)}
    while len(perms) < n:
        p = list(ALPHA)
        rng.shuffle(p)
        perm = "".join(p)
        key = "".join(perm[ALPHA.index(c)] for c in used_alphabet)
        if key not in seen:
            seen.add(key)
            perms.append(perm)
    return perms


def main() -> None:
    sf = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    reps = sf * 10  # sf0.1 base
    dst = os.path.join(HERE, ".scale", f"sf{sf}")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    used = con.sql(
        f"""SELECT string_agg(DISTINCT c, '' ORDER BY c)
            FROM (SELECT unnest(string_split(text, '')) AS c
                  FROM read_parquet('{SRC}/documents.parquet'))
            WHERE c BETWEEN 'a' AND 'z'"""
    ).fetchone()[0]
    perms = distinct_permutations(reps, used)
    perm_list = "[" + ", ".join(f"'{p}'" for p in perms) + "]"

    con.execute(
        f"""
        COPY (
          SELECT doc_id + r.i*10000000 AS doc_id,
                 translate(text, '{ALPHA}', {perm_list}[r.i + 1]) AS text,
                 lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet') t
          CROSS JOIN range({reps}) r(i)
        ) TO '{os.path.join(dst, "documents.parquet")}' (FORMAT PARQUET)
        """
    )
    # shift by i % DIM, negate every element when i >= DIM (orthogonal)
    con.execute(
        f"""
        COPY (
          SELECT vec_id + r.i*10000000 AS vec_id,
                 CAST(list_transform(
                        list_concat(embedding[(r.i % {DIM})+1:],
                                    embedding[:(r.i % {DIM})]),
                        x -> CASE WHEN r.i >= {DIM} THEN -x ELSE x END)
                      AS FLOAT[]) AS embedding,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet') t
          CROSS JOIN range({reps}) r(i)
        ) TO '{os.path.join(dst, "embeddings.parquet")}' (FORMAT PARQUET)
        """
    )
    # relational / event tables: per-replica disjoint id spaces (the
    # gen_scale_sf.py transforms, generalized to R replicas) — group
    # counts scale xR at constant group size, the shape of real growth
    rel = {
        "events": """event_id + r.i*1000000000 AS event_id, ts,
                     user_id + r.i*10000000 AS user_id, event_type, value, props""",
        "orders": """o_orderkey + r.i*100000000 AS o_orderkey,
                     o_custkey + r.i*10000000 AS o_custkey,
                     o_orderstatus, o_totalprice, o_orderdate, o_orderpriority""",
        "lineitem": """l_orderkey + r.i*100000000 AS l_orderkey,
                       l_partkey + r.i*10000000 AS l_partkey,
                       l_suppkey + r.i*1000000 AS l_suppkey,
                       l_linenumber, l_quantity, l_extendedprice, l_discount,
                       l_tax, l_returnflag, l_linestatus, l_shipdate""",
        "customer": """c_custkey + r.i*10000000 AS c_custkey,
                       c_name || '-r' || r.i AS c_name,
                       c_nationkey, c_acctbal, c_mktsegment""",
        "supplier": """s_suppkey + r.i*1000000 AS s_suppkey,
                       s_name || '-r' || r.i AS s_name,
                       s_nationkey, s_acctbal""",
    }
    for t, select in rel.items():
        con.execute(
            f"""
            COPY (
              SELECT {select}
              FROM read_parquet('{SRC}/{t}.parquet') t
              CROSS JOIN range({reps}) r(i)
            ) TO '{os.path.join(dst, t + '.parquet')}' (FORMAT PARQUET)
            """
        )
    for t in ("nation", "region", "part"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{os.path.join(dst, t + '.parquet')}' (FORMAT PARQUET)"
        )
    for t in ("documents", "embeddings", "events", "orders", "lineitem"):
        n = con.execute(
            f"SELECT count(*) FROM '{os.path.join(dst, t + '.parquet')}'"
        ).fetchone()[0]
        print(f"sf{sf} {t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
