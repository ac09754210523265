"""Scalar column expressions X1–X6 (SURVEY.md §2.3).

All pure Column expressions — JVM-side, whole-stage-codegen friendly, zero
Python UDFs. Each preserves the reference's exact semantics (cited); the
notable one is :func:`parse_boolean`, whose junk→false truth table differs
from ``cast('boolean')`` (which yields NULL on junk) and must not be
"simplified" into a cast.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRUE_TOKENS = ("yes", "true", "1")
_FALSE_TOKENS = ("no", "false", "0")


def parse_boolean(c: Column | str) -> Column:
    """X1 — boolean-ish string → boolean, junk (incl. NULL) → false.

    Reference: ``parse_boolean`` at ``staffing-roster-pipeline.py:117-126``
    (case-insensitive trim; {yes,true,1}→true, {no,false,0}→false, anything
    else → false). NOT ``cast('boolean')``: the truth table maps junk to
    false, not NULL.
    """
    c = F.col(c) if isinstance(c, str) else c
    norm = F.lower(F.trim(c))
    return F.when(norm.isin(*_TRUE_TOKENS), F.lit(True)).otherwise(
        F.when(norm.isin(*_FALSE_TOKENS), F.lit(False)).otherwise(F.lit(False))
    )


def nullif_blank(c: Column | str) -> Column:
    """X2 — empty/whitespace-only string → NULL (write-prep normalization,
    ``staffing-roster-pipeline.py:138,194,216`` + blank test at ``:69``)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.when(F.trim(c) == "", F.lit(None)).otherwise(c)


def is_blank(c: Column | str) -> Column:
    """X4 — NULL or whitespace-only (``staffing-roster-pipeline.py:69``)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.isNull() | (F.trim(c) == "")


def split_trim_lower(c: Column | str, sep: str = ",") -> Column:
    """X3 — comma-separated cell → array of trimmed, lowercased tokens
    (day-list parsing, ``staffing-roster-pipeline.py:98``). Empty tokens are
    dropped (the reference's membership tests never match them)."""
    c = F.col(c) if isinstance(c, str) else c
    toks = F.transform(F.split(c, sep), lambda x: F.lower(F.trim(x)))
    return F.filter(toks, lambda x: x != "")


def safe_long(c: Column | str) -> Column:
    """X5 — numeric cast; junk → NULL (caller routes NULLs to quarantine
    with an E003 reason instead of raising, per ``projects-pipeline.py:139-142``)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(c).cast("long")


def bits_to_string(arr: Column | str) -> Column:
    """X6 — ``array<boolean>`` → '0'/'1' bitstring
    (``staffing-roster-pipeline.py:114``)."""
    arr = F.col(arr) if isinstance(arr, str) else arr
    return F.array_join(
        F.transform(arr, lambda b: F.when(b, F.lit("1")).otherwise(F.lit("0"))), ""
    )


def surrogate_key(*cols: Column | str) -> Column:
    """Deterministic 64-bit surrogate key over natural-key columns.

    Replaces the reference's serial ``RETURNING user_id``/``project_id``
    (``staffing-roster-pipeline.py:144``, ``projects-pipeline.py:300``):
    sequence generation is a serialization point a distributed engine must
    not have. ``xxhash64`` is stable across runs/partitions/executors, so
    keys are reproducible and joins on them are shuffle-friendly.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.xxhash64(*cs)
