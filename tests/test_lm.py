"""operators/lm.py: add-k bigram LM — counts, scoring vs an independent
python model, edge cases, determinism."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from yelpdatawarehouse_spark.operators.lm import (
    bigram_counts,
    score_bigram_addk,
    unigram_counts,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate"),
    (2, "a dog sat"),
    (3, "single"),
    (4, "the the the"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_model(alpha=0.5):
    uni: Counter = Counter()
    bi: Counter = Counter()
    for _, t in DOCS:
        toks = t.split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    v = len(uni)

    def lp(w1, w2):
        return math.log((bi[(w1, w2)] + alpha) / (uni[w1] + alpha * v))

    return uni, bi, v, lp


def test_counts_match_python(spark, docs):
    uni, bi, _, _ = _py_model()
    assert {(r.w, r.cnt) for r in unigram_counts(docs).collect()} == {
        (w, c) for w, c in uni.items()
    }
    assert {(r.w1, r.w2, r.cnt) for r in bigram_counts(docs).collect()} == {
        (a, b, c) for (a, b), c in bi.items()
    }


def test_scores_match_python_reference(spark, docs):
    _, _, _, lp = _py_model(alpha=0.5)
    got = {r.doc_id: r for r in score_bigram_addk(docs, alpha=0.5).collect()}
    for doc_id, text in DOCS:
        toks = text.split()
        pairs = list(zip(toks, toks[1:]))
        assert got[doc_id].n_bigrams == len(pairs)
        if pairs:
            exp = sum(lp(a, b) for a, b in pairs) / len(pairs)
            assert abs(got[doc_id].avg_logprob - exp) < 1e-9
        else:
            assert got[doc_id].avg_logprob is None


def test_repeated_token_runs(spark, docs):
    """'the the the' exercises c(w1,w2) with w1 == w2 and overlapping
    adjacency (counted per occurrence, like any n-gram model)."""
    bi = {(r.w1, r.w2): r.cnt for r in bigram_counts(docs).collect()}
    assert bi[("the", "the")] == 2


def test_all_docs_survive_scoring(spark, docs):
    out = score_bigram_addk(docs).collect()
    assert {r.doc_id for r in out} == {d for d, _ in DOCS}


def test_quality_signal_orders_inlier_above_shuffled(spark):
    """The actual filter property: a document made of corpus-frequent
    bigrams must outscore one of never-seen bigrams."""
    base = [(i, "good tokens flow naturally here") for i in range(5)]
    rows = base + [(100, "naturally flow tokens good here"),
                   (101, "good tokens flow naturally here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.avg_logprob for r in score_bigram_addk(docs).collect()}
    assert got[101] > got[100]


def test_determinism_across_partitioning(spark, docs):
    a = sorted(map(tuple, score_bigram_addk(docs).collect()))
    b = sorted(map(tuple, score_bigram_addk(docs.repartition(5)).collect()))
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0] and ra[1] == rb[1]
        if ra[2] is None:
            assert rb[2] is None
        else:
            assert abs(ra[2] - rb[2]) < 1e-12


def test_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert score_bigram_addk(empty).count() == 0
