"""BPE trainer/encoder invariants (operators/bpe.py).

The one-merge slice is hash-checked against the DuckDB oracle via
test_parity (text_bpe_one_merge_compression); these tests pin the
properties of the multi-merge path that SQL cannot express.
"""

from __future__ import annotations

from yelpdatawarehouse_spark.operators.bpe import (
    _merge_word,
    bpe_segmenter,
    segment_word,
    train_bpe,
    word_counts,
)
from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return table(spark, SF, "documents")


def test_train_deterministic(spark):
    m1 = train_bpe(_docs(spark), n_merges=8)
    m2 = train_bpe(_docs(spark), n_merges=8)
    assert m1 == m2
    assert len(m1) == 8
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in m1)


def test_first_merge_is_top_pair(spark):
    """Trainer's first rule == argmax of the oracled pair-count query."""
    from yelpdatawarehouse_spark.queries import all_queries

    reg = all_queries()
    top = (
        reg["text_bpe_pair_counts"]
        .fn(spark, SF)
        .orderBy("pair_count", ascending=False)
        .collect()
    )
    best_cnt = top[0]["pair_count"]
    best_pairs = {r["pair"] for r in top if r["pair_count"] == best_cnt}
    (a, b) = train_bpe(_docs(spark), n_merges=1)[0]
    assert a + b in best_pairs
    # tie-break: trainer picks the lexicographically smallest of the tied
    assert a + b == min(best_pairs)


def test_segment_reconstructs_and_is_monotone(spark):
    vocab = [r["w"] for r in word_counts(_docs(spark)).collect() if r["w"]]
    merges = train_bpe(_docs(spark), n_merges=12)
    prev_total = None
    for k in (0, 3, 6, 12):
        ranks = {p: i for i, p in enumerate(merges[:k])}
        total = 0
        for w in vocab:
            syms = segment_word(w, ranks)
            assert "".join(syms) == w  # lossless
            total += len(syms)
        if prev_total is not None:
            assert total <= prev_total  # more merges never add symbols
        prev_total = total
    # with zero merges, every symbol is a single character
    assert sum(len(w) for w in vocab) >= prev_total


def test_one_rule_greedy_equals_nonoverlap_count():
    """The property the SQL oracle relies on: applying ONE rule greedily
    removes exactly one symbol per non-overlapping occurrence."""
    for w, pair in [
        ("aaa", ("a", "a")),
        ("aaaa", ("a", "a")),
        ("banana", ("a", "n")),
        ("xyxyx", ("x", "y")),
        ("zzz", ("x", "y")),
    ]:
        syms = segment_word(w, {pair: 0})
        sep = pair[0] + pair[1]
        nonoverlap = len(w.split(sep)) - 1
        assert len(syms) == len(w) - nonoverlap, (w, pair, syms)


def test_merge_word_leftmost_first():
    assert _merge_word(tuple("aaa"), ("a", "a")) == ("aa", "a")
    assert _merge_word(tuple("aaaa"), ("a", "a")) == ("aa", "aa")
    assert _merge_word(tuple("abab"), ("a", "b")) == ("ab", "ab")
    assert _merge_word(("ab", "a", "b"), ("a", "b")) == ("ab", "ab")


def test_segmenter_udf_matches_driver_path(spark):
    merges = train_bpe(_docs(spark), n_merges=6)
    ranks = {p: i for i, p in enumerate(merges)}
    from pyspark.sql import functions as F

    seg = bpe_segmenter(merges)
    rows = (
        word_counts(_docs(spark))
        .withColumn("syms", seg(F.col("w")))
        .orderBy("w")
        .limit(50)
        .collect()
    )
    assert rows
    for r in rows:
        assert list(r["syms"]) == segment_word(r["w"], ranks)


def test_empty_corpus_trains_nothing(spark):
    empty = _docs(spark).filter("doc_id < 0")
    assert train_bpe(empty, n_merges=5) == []


from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.text(alphabet="abcxyz", min_size=1, max_size=12)
_pairs = st.lists(
    st.tuples(st.text("abcxyz", min_size=1, max_size=2),
              st.text("abcxyz", min_size=1, max_size=2)),
    max_size=6,
)


@settings(max_examples=200, deadline=None)
@given(_words, _pairs)
def test_segment_properties_random(word, merges):
    """For ANY merge table: segmentation is lossless, never grows beyond
    character count, and re-applying to the already-segmented symbols is a
    fixed point (greedy encoder is idempotent)."""
    ranks = {p: i for i, p in enumerate(merges)}
    syms = segment_word(word, ranks)
    assert "".join(syms) == word
    assert 1 <= len(syms) <= len(word)
    # idempotence: no adjacent pair in the output is still mergeable
    for a, b in zip(syms, syms[1:]):
        assert (a, b) not in ranks
