"""Text-analysis operators for training-data pipelines (SURVEY §7.7).

All pure Column expressions over the ``documents`` table — JVM-side,
codegen'd, no Python in the hot path. Designed for 100 TB: every function is
a narrow per-row projection (zero shuffle); the only shuffles in the
downstream queries are the final aggregations.

Operators: tokenization, token counting (whitespace + BPE-ish regex),
quality scoring (length/punct/stopword ratios), n-gram-heuristic language
ID, rolling-hash document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"
#: word-or-single-punct pieces — a BPE-ish lower bound on subword count.
BPE_ISH = r"\w+|[^\w\s]"
PUNCT = r"[^\w\s]"

#: Small per-language stopword lists for the n-gram/stopword heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "a"),
    "es": ("el", "la", "de", "que", "y", "los", "una"),
    "de": ("der", "die", "und", "das", "ist", "von", "ein"),
    "fr": ("le", "les", "et", "des", "est", "une", "dans"),
}
CJK_RANGE = "[\\u4e00-\\u9fff]"

FINGERPRINT_MOD = 2147483647  # 2^31-1; keeps acc*31+c within int64


def tokens(c: Column | str) -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    c = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT), lambda x: x != "")


def token_count(c: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(c))


def bpe_ish_count(c: Column | str) -> Column:
    """Sub-word-ish piece count: words + individual punctuation marks."""
    c = F.col(c) if isinstance(c, str) else c
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH), 0))


def punct_count(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.size(F.regexp_extract_all(c, F.lit(PUNCT), 0))


def stopword_count(c: Column | str, lang: str = "en") -> Column:
    words = LANG_STOPWORDS[lang]
    return F.size(
        F.filter(tokens(c), lambda t: t.isin(*words))
    )


def quality_metrics(c: Column | str) -> dict[str, Column]:
    """Document quality signals (each a deterministic double):

    - ``n_tokens``/``n_chars`` — raw sizes
    - ``avg_token_len`` — chars per token
    - ``punct_ratio`` — punctuation marks per char
    - ``stopword_ratio`` — English stopwords per token (fluency proxy)
    """
    c = F.col(c) if isinstance(c, str) else c
    toks = tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    return {
        "n_tokens": n_tok.cast("long"),
        "n_chars": n_chars.cast("long"),
        "avg_token_len": (
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast(
                "double"
            )
            / F.greatest(n_tok, F.lit(1))
        ),
        "punct_ratio": punct_count(c).cast("double") / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": stopword_count(c).cast("double") / F.greatest(n_tok, F.lit(1)),
    }


def lang_id(c: Column | str) -> Column:
    """Heuristic language ID: CJK characters → ``zh``; otherwise the
    language with the highest stopword hit count (ties resolve in en → es →
    de → fr order, matching the deterministic CASE in the SQL oracle);
    no hits at all → ``und``."""
    c = F.col(c) if isinstance(c, str) else c
    toks = tokens(c)

    def _hits(words: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    counts = {lang: _hits(words) for lang, words in LANG_STOPWORDS.items()}
    best = F.greatest(*counts.values())
    out = F.lit("und")
    # build the when-chain in reverse priority so earlier langs win ties
    for lang in reversed(list(LANG_STOPWORDS)):
        out = F.when((counts[lang] > 0) & (counts[lang] == best), F.lit(lang)).otherwise(out)
    return F.when(F.regexp_count(c, F.lit(CJK_RANGE)) > 0, F.lit("zh")).otherwise(out)


def fingerprint(c: Column | str) -> Column:
    """Rolling polynomial hash of the character stream, mod 2^31-1 — a
    deterministic document fingerprint computable identically in any engine
    with a left fold (``acc·31 + codepoint mod p``)."""
    c = F.col(c) if isinstance(c, str) else c
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD,
    )


#: PII patterns kept to RE2-safe syntax (no backrefs / lookaround) so the
#: same pattern string runs in Spark (Java regex) and DuckDB (RE2).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def pii_redaction_count(c: Column | str) -> Column:
    """Number of PII spans (emails + phone-shaped numbers) in the text."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_count(c, F.lit(EMAIL_RE)) + F.regexp_count(c, F.lit(PHONE_RE))


def pii_scrub(c: Column | str) -> Column:
    """Replace every email / phone-shaped span with a typed placeholder.

    Pure per-row projection (zero shuffle); at 100 TB this runs inside
    whole-stage codegen on the scan, so scrubbing is I/O-bound. Order
    matters only across overlapping patterns — emails are replaced first so
    digit runs inside a local-part are not half-scrubbed by the phone rule."""
    c = F.col(c) if isinstance(c, str) else c
    out = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def normalize(c: Column | str) -> Column:
    """Canonical text normalization for dedup keys and tokenizer input:
    lowercase, non-alphanumerics → space, whitespace runs collapsed, ends
    trimmed. Pure projection — runs in whole-stage codegen on the scan at
    any scale. Mirrors in ANSI SQL as nested ``regexp_replace`` (DuckDB
    needs the 'g' flag; Spark replaces globally by default)."""
    c = F.col(c) if isinstance(c, str) else c
    out = F.lower(c)
    out = F.regexp_replace(out, r"[^a-z0-9\s]", " ")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


#: Fixed logistic-regression weights for the quality classifier — the
#: shape of a fastText/CCNet-style learned quality filter, with published
#: (deterministic) coefficients so inference is reproducible everywhere.
#: Order matters: the logit is evaluated as the literal left-to-right
#: chain below in BOTH engines, so the doubles agree bit-for-bit.
QUALITY_LR = {
    "intercept": -1.2,
    "stopword_ratio": 12.0,
    "avg_token_len": 0.2,
    "n_tokens": -0.004,
}


def quality_logit(c: Column | str) -> Column:
    """Linear quality-classifier inference over :func:`quality_metrics`
    features: ``logit = b + w1·stopword_ratio + w2·avg_token_len +
    w3·n_tokens``. Pure per-row projection — the 100 TB 'apply the learned
    quality filter' step is a broadcast of O(weights) constants into
    whole-stage codegen, zero shuffle, no model server in the loop."""
    m = quality_metrics(c)
    w = QUALITY_LR
    return (
        F.lit(w["intercept"])
        + F.lit(w["stopword_ratio"]) * m["stopword_ratio"]
        + F.lit(w["avg_token_len"]) * m["avg_token_len"]
        + F.lit(w["n_tokens"]) * m["n_tokens"].cast("double")
    )


def compression_ratio(c: Column | str) -> Column:
    """Deflate-compressed length over raw length per document (Gopher/
    MassiveText quality signal): highly repetitive machine-generated text
    compresses far below ~0.4; random or encrypted junk sits near 1.0.

    Arrow-batched pandas UDF (zlib level 6) — the ONE text operator where
    Python is the right tool: there is no Column-expression compressor,
    and the UDF is pure CPU over one string column. NULL/empty → NULL.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(texts):  # pd.Series -> pd.Series
        import zlib

        import pandas as pd

        out = []
        for t in texts:
            if t is None or len(t) == 0:
                out.append(None)
            else:
                raw = t.encode("utf-8")
                out.append(len(zlib.compress(raw, 6)) / len(raw))
        return pd.Series(out, dtype="float64")

    c = F.col(c) if isinstance(c, str) else c
    return _ratio(c)
