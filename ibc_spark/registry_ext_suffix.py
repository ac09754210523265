"""Suffix-array registry entries (round 11): the EXACT substring-dedup
machinery of Lee et al. 2022 that the windowed dedup family approximates
— distributed Manber–Myers prefix doubling (:mod:`ibc_spark.ext.suffix`),
rank-table LCP, exact longest-repeated-substring, and the SA-derived
duplicate-span attestation whose output contract is bit-identical to
``dedup_duplicate_spans``.

DuckDB replays the suffix order directly (sort the sentinel-terminated
suffix token lists — unique per-document sentinels cap every comparison
at the document boundary, so materializing the in-document slice is the
WHOLE suffix for ordering purposes) and the LCP as the minimum mismatch
index over an exploded position range; the Spark side never materializes
a suffix, only (position, rank) frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ibc_spark.ext import suffix
from ibc_spark.io_.sources import read_table
from ibc_spark.registry_core import query
from ibc_spark.registry_ext_base import _TOKS

# Shared oracle fragments: the sentinel-terminated suffix keys and their
# global lexicographic rank. list ORDER BY in DuckDB is element-wise
# VARCHAR comparison = Spark's string ordering (both binary UTF-8); the
# 'T'-token / 'S'-sentinel namespacing is the same on both engines, so
# no corpus token can ever collide with (or sort astride) a sentinel.
_SU = f"""
    t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    su AS (
      SELECT doc_id, CAST(u.i AS INT) AS pos, len(toks) AS n_toks,
             list_append(
               list_transform(list_slice(toks, u.i, len(toks)), x -> 'T' || x),
               'S' || CAST(doc_id AS VARCHAR)) AS sk
      FROM t, unnest(range(1, len(toks) + 2)) AS u(i)
    )
"""


@query(
    "suffix_array_rank",
    oracle=f"""
    WITH {_SU},
    ord AS (SELECT doc_id, pos, n_toks,
                   row_number() OVER (ORDER BY sk) AS sa_rank
            FROM su)
    SELECT doc_id, pos, CAST(sa_rank AS BIGINT) AS sa_rank
    FROM ord WHERE pos <= n_toks
    """,
)
def suffix_array_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus suffix array: the exact global lexicographic rank of the
    suffix starting at every token position (Manber–Myers prefix doubling
    as DataFrame rounds — two-phase global rank per round, round count
    bounded by the longest DOCUMENT thanks to unique sentinels, not by
    corpus size). The full (doc, pos) → rank permutation is the output,
    so a single hash match proves the entire construction: every round's
    pair ranking, the sentinel ordering, and the two-phase rank offsets."""
    d = read_table(spark, sf_dir, "documents")
    return suffix.suffix_array_ranks(d, id_col="doc_id", text_col="text")


# SA order + per-adjacent-pair LCP (min mismatch index), shared by the
# LRS and duplication-spectrum oracles.
_ADJ_LCP = f"""{_SU},
    ord AS (SELECT doc_id, pos, sk,
                   row_number() OVER (ORDER BY sk) AS r
            FROM su),
    adj AS (
      SELECT a.r AS r, a.doc_id AS doc_id, a.pos AS pos, a.sk AS ska,
             b.doc_id AS nbr_doc_id, b.pos AS nbr_pos, b.sk AS skb
      FROM ord a JOIN ord b ON b.r = a.r + 1
    ),
    mm AS (
      SELECT adj.r AS r, min(v.j) - 1 AS lcp
      FROM adj, unnest(range(1, least(len(ska), len(skb)) + 1)) AS v(j)
      WHERE ska[v.j] IS DISTINCT FROM skb[v.j]
      GROUP BY adj.r
    )
"""


@query(
    "suffix_lrs",
    oracle=f"""
    WITH {_ADJ_LCP}
    SELECT CAST(m.lcp AS BIGINT) AS lcp_len, a.doc_id AS doc_id,
           a.pos AS pos, a.nbr_doc_id AS nbr_doc_id, a.nbr_pos AS nbr_pos,
           array_to_string(
             list_slice(t2.toks, a.pos, a.pos + CAST(m.lcp AS INT) - 1),
             ' ') AS passage
    FROM mm m JOIN adj a USING (r) JOIN t t2 ON t2.doc_id = a.doc_id
    WHERE m.lcp >= 1
    ORDER BY lcp_len DESC, doc_id, pos, nbr_doc_id, nbr_pos
    LIMIT 20
    """,
)
def suffix_lrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 longest repeated token substrings — exact, any length, any
    offset (fixed-window dedup needs the length a priori; the suffix
    array answers the open question). Spark derives each SA-adjacent
    pair's LCP from the retained doubling rank tables (two int64 hash
    joins per level, zero Python); the oracle recomputes it as the
    minimum mismatch index over the materialized suffix keys. A unique
    sentinel argument guarantees every LCP stays inside one document, so
    the passage reconstructs from the earlier occurrence's own tokens."""
    d = read_table(spark, sf_dir, "documents")
    return suffix.longest_repeated_substrings(
        d, id_col="doc_id", text_col="text", top_n=20
    )


@query(
    "suffix_lcp_histogram",
    oracle=f"""
    WITH {_ADJ_LCP}
    SELECT CAST(lcp AS BIGINT) AS lcp_len,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM mm GROUP BY 1
    """,
)
def suffix_lcp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplication spectrum: the distribution of adjacent-suffix
    LCPs. The tail mass ≥ L is exactly the count of duplicated-L-gram
    start positions, so one scan profiles what substring dedup would cut
    at EVERY window length before committing to a threshold — the
    planning question the fixed-window family has to re-scan per
    candidate L. Output is bounded by the longest document; the final
    aggregate is broadcast-sized."""
    d = read_table(spark, sf_dir, "documents")
    return suffix.lcp_histogram(d, id_col="doc_id", text_col="text")


@query(
    "dedup_duplicate_spans_sa",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    occ AS (
      SELECT doc_id, CAST(u.i AS INT) AS start_tok,
             array_to_string(list_slice(toks, u.i, u.i + 9), ' ') AS passage
      FROM t, unnest(CASE WHEN len(toks) >= 10
                          THEN range(1, len(toks) - 8) ELSE [] END) AS u(i)
    ),
    dup AS (
      SELECT doc_id, start_tok
      FROM occ
      QUALIFY COUNT(*) OVER (PARTITION BY passage) > 1
    ),
    flagged AS (
      SELECT doc_id, start_tok,
             CASE WHEN max(start_tok + 9) OVER (
                      PARTITION BY doc_id ORDER BY start_tok
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                  OR start_tok > max(start_tok + 9) OVER (
                      PARTITION BY doc_id ORDER BY start_tok
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
             THEN 1 ELSE 0 END AS opens
      FROM dup
    ),
    spans AS (
      SELECT doc_id, start_tok,
             sum(opens) OVER (PARTITION BY doc_id ORDER BY start_tok
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
      FROM flagged
    )
    SELECT doc_id, CAST(span_id AS INT) AS span_id,
           min(start_tok) AS span_start,
           max(start_tok) + 9 AS span_end,
           CAST(max(start_tok) + 9 - min(start_tok) + 1 AS BIGINT)
             AS span_tokens,
           count(*) AS n_windows
    FROM spans GROUP BY doc_id, span_id
    """,
)
def dedup_duplicate_spans_sa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate spans THROUGH the suffix array (window=10) — the literal
    Lee et al. 2022 pipeline: position p starts a duplicated 10-gram iff
    max(LCP with its two SA neighbors) ≥ 10, then the shared gap-merge
    sweep. The oracle is the WINDOWED formulation (the existing
    ``dedup_duplicate_spans`` contract, verbatim): two independent
    algorithms — SA+LCP here, stride-1 window counting there — required
    to agree row-for-row, which retires the 'windowed approximates the
    suffix array' caveat by proving the equivalence on every driver run."""
    d = read_table(spark, sf_dir, "documents")
    return suffix.sa_duplicate_spans(d, id_col="doc_id", text_col="text", window=10)


@query(
    "dedup_spans_rewrite_sa",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks,
                      list_filter(string_split_regex(text, '\\s+'), x -> x <> '')
                        AS rawtoks
               FROM documents),
    occ AS (
      SELECT doc_id, CAST(u.i AS INT) AS start_tok,
             array_to_string(list_slice(toks, u.i, u.i + 9), ' ') AS passage
      FROM t, unnest(CASE WHEN len(toks) >= 10
                          THEN range(1, len(toks) - 8, 1) ELSE [] END) AS u(i)
    ),
    marked AS (
      SELECT doc_id, start_tok,
             COUNT(*) OVER (PARTITION BY passage) AS n_occ,
             ROW_NUMBER() OVER (PARTITION BY passage
                                ORDER BY doc_id, start_tok) AS rk
      FROM occ
    ),
    cuts AS (SELECT doc_id, start_tok FROM marked WHERE n_occ > 1 AND rk > 1),
    sw AS (
      SELECT doc_id, start_tok,
             CASE WHEN max(start_tok + 9) OVER (PARTITION BY doc_id
                    ORDER BY start_tok
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  OR start_tok > max(start_tok + 9) OVER (PARTITION BY doc_id
                    ORDER BY start_tok
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                  THEN 1 ELSE 0 END AS opens
      FROM cuts
    ),
    sp AS (
      SELECT doc_id, start_tok,
             sum(opens) OVER (PARTITION BY doc_id ORDER BY start_tok
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
      FROM sw
    ),
    spans AS (
      SELECT doc_id, min(start_tok) AS s, max(start_tok) + 9 AS e
      FROM sp GROUP BY doc_id, span_id
    ),
    tokpos AS (
      SELECT doc_id, CAST(u.i AS INT) AS pos, rawtoks[u.i] AS tok
      FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
    ),
    kept AS (
      SELECT tp.doc_id, tp.pos, tp.tok
      FROM tokpos tp
      WHERE NOT EXISTS (SELECT 1 FROM spans s
                        WHERE s.doc_id = tp.doc_id AND tp.pos BETWEEN s.s AND s.e)
    ),
    agg AS (
      SELECT doc_id, count(*) AS kept_n,
             string_agg(tok, ' ' ORDER BY pos) AS txt
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(len(t.toks) - coalesce(agg.kept_n, 0) AS BIGINT) AS cut_tokens,
           CAST(coalesce(agg.kept_n, 0) AS BIGINT) AS kept_tokens,
           coalesce(agg.txt, '') AS cleaned_text
    FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id
    """,
)
def dedup_spans_rewrite_sa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL Lee et al. 2022 pipeline through the suffix array — find
    duplicated substrings AND emit the cleaned corpus: occurrences of the
    same 10-gram are the maximal SA runs with adjacent LCP ≥ 10, the run's
    min-(doc, pos) member stays canonical, the rest cut, gap-merged, and
    the documents rewritten case-preserved. The oracle is the WINDOWED
    formulation (the ``dedup_spans_rewrite`` contract, verbatim): two
    independent algorithms required to produce the identical cleaned
    corpus, row for row — the strongest attestation in the family, since
    it covers canonical election and the apply step, not just span
    reporting."""
    d = read_table(spark, sf_dir, "documents")
    return suffix.sa_spans_rewrite(d, id_col="doc_id", text_col="text", window=10)
