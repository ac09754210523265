"""Contracts for iterative BPE training (round 10): the delimiter-replace
merge must equal greedy left-to-right BPE on arbitrary words, the learned
trajectory must match a reference Python trainer on a tiny corpus, and the
entry must be total on an empty corpus."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.text(alphabet="ab", min_size=1, max_size=12)


def _greedy_merge(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Reference greedy left-to-right BPE merge application."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _rep(syms: list[str]) -> str:
    return "|" + "||".join(syms) + "|"


def _split(rep: str) -> list[str]:
    return rep[1:-1].split("||")


@given(word=_WORD, l=st.sampled_from("ab"), r=st.sampled_from("ab"))
@settings(max_examples=300, deadline=None)
def test_delimiter_replace_equals_greedy_bpe(word, l, r):
    """str.replace on the '|sym|'-wrapped representation IS greedy BPE:
    the exact property the Spark/DuckDB arms rely on (engine replace() is
    leftmost-non-overlapping, and wrapped symbols never share chars)."""
    syms = list(word)
    got = _rep(syms).replace(f"|{l}||{r}|", f"|{l}{r}|")
    assert _split(got) == _greedy_merge(syms, (l, r))


def _reference_trainer(words: dict[str, int], steps: int):
    """Tiny reference BPE trainer (count DESC, pair ASC tie-break)."""
    segs = {w: list(w) for w in words}
    merges = []
    for _ in range(steps):
        counts: dict[tuple[str, str], int] = {}
        for w, n in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], counts[best]))
        segs = {w: _greedy_merge(s, best) for w, s in segs.items()}
    return merges, segs


def test_entry_matches_reference_trainer(spark):
    from ibc_spark.registry import QUERIES

    import os
    import tempfile

    corpus = ["aba ab abab", "ab aba", "abab abab b"]
    words: dict[str, int] = {}
    for line in corpus:
        for w in line.split():
            words[w] = words.get(w, 0) + 1
    want_merges, segs = _reference_trainer(words, 3)

    tmp = tempfile.mkdtemp(prefix="ibc_bpe_")
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(corpus)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))

    rows = QUERIES["vocab_bpe_train_merges"](spark, tmp).collect()
    got_merges = [
        (r.sym_a, r.sym_b, r.n) for r in sorted(rows, key=lambda r: r.step) if r.kind == "merge"
    ]
    assert got_merges == want_merges

    sym_counts: dict[str, int] = {}
    for w, n in words.items():
        for s in segs[w]:
            sym_counts[s] = sym_counts.get(s, 0) + n
    want_top = sorted(sym_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got_top = [(r.sym_a, r.n) for r in rows if r.kind == "symbol"]
    assert sorted(got_top, key=lambda kv: (-kv[1], kv[0])) == want_top


def test_bpe_entry_on_empty_corpus(spark, empty_sf):
    from ibc_spark.registry import QUERIES

    assert QUERIES["vocab_bpe_train_merges"](spark, empty_sf).count() == 0


def test_pair_exhaustion_keeps_histogram_and_vocab(spark, duck):
    """Review fix: when the corpus exhausts its pairs before the last
    step, the missing argmax must leave the word histogram intact (LEFT
    JOIN, not CROSS JOIN) — merges stop early but the final-vocabulary
    rows survive, in BOTH arms."""
    import os
    import tempfile

    import duckdb

    from ibc_spark.registry import ORACLES, QUERIES
    from tests.parity import assert_parity

    tmp = tempfile.mkdtemp(prefix="ibc_bpe_exhaust_")
    spark.createDataFrame(
        [(1, "ab ab ab", "en", "s", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))

    rows = QUERIES["vocab_bpe_train_merges"](spark, tmp).collect()
    merges = [r for r in rows if r.kind == "merge"]
    symbols = [r for r in rows if r.kind == "symbol"]
    assert [(m.sym_a, m.sym_b, m.n) for m in merges] == [("a", "b", 3)]
    assert [(s.sym_a, s.n) for s in symbols] == [("ab", 3)]

    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from read_parquet('{tmp}/documents.parquet/*.parquet')"
    )
    assert_parity(
        "vocab_bpe_train_merges",
        QUERIES["vocab_bpe_train_merges"](spark, tmp),
        con,
        ORACLES["vocab_bpe_train_merges"],
    )


def test_apply_compression_matches_reference(spark):
    """The apply face must equal the reference trainer's segmentation
    summed over the corpus with word multiplicity."""
    import os
    import tempfile

    from ibc_spark.registry import QUERIES

    corpus = [("sa", "aba ab abab"), ("sb", "ab aba"), ("sb", "abab abab b")]
    words: dict[str, int] = {}
    for _, line in corpus:
        for w in line.split():
            words[w] = words.get(w, 0) + 1
    _, segs = _reference_trainer(words, 3)

    want: dict[str, tuple[int, int, int]] = {}
    for src, line in corpus:
        nw, nc, nt = want.get(src, (0, 0, 0))
        for w in line.split():
            nw, nc, nt = nw + 1, nc + len(w), nt + len(segs[w])
        want[src] = (nw, nc, nt)

    tmp = tempfile.mkdtemp(prefix="ibc_bpe_apply_")
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(corpus)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))

    rows = QUERIES["vocab_bpe_apply_compression"](spark, tmp).collect()
    got = {r.source: (r.n_words, r.n_chars, r.n_bpe_tokens) for r in rows}
    assert got == want
    for r in rows:
        assert abs(r.chars_per_token - r.n_chars / r.n_bpe_tokens) < 1e-6


def test_apply_compression_on_empty_corpus(spark, empty_sf):
    from ibc_spark.registry import QUERIES

    assert QUERIES["vocab_bpe_apply_compression"](spark, empty_sf).count() == 0


def test_apply_counts_unsegmentable_tokens_at_char_granularity(spark):
    """Review fix: tokens the histogram excluded (delimiter collisions)
    must count at character granularity — the BPE OOV convention — not
    vanish from the per-source stats."""
    import os
    import tempfile

    from ibc_spark.registry import QUERIES

    tmp = tempfile.mkdtemp(prefix="ibc_bpe_pipe_")
    spark.createDataFrame(
        [(1, "ab ab zz|z", "en", "sc", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    r = QUERIES["vocab_bpe_apply_compression"](spark, tmp).collect()[0]
    # 3 words, 8 chars; 'ab' merges to 1 symbol each, 'zz|z' falls back to
    # its 4 characters
    assert (r.n_words, r.n_chars, r.n_bpe_tokens) == (3, 8, 1 + 1 + 4)


def test_checkpointed_training_trajectory_is_identical(spark):
    """r11: lineage checkpointing every N steps (the production-merge-
    count posture) must not perturb the training trajectory — merges and
    final histogram equal the checkpoint-free run."""
    from ibc_spark.registry_ext_text import _bpe_train

    sf = "/root/testdata/sf0.001"

    def run(ck):
        w, frames = _bpe_train(spark, sf, steps=10, checkpoint_every=ck)
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionAll(fr)
        merges = [tuple(r) for r in out.collect()]
        hist = sorted(tuple(r) for r in w.collect())
        return merges, hist

    assert run(3) == run(10_000)
