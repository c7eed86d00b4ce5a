"""Unit tests for the LIBRARY form of the retrieval stack
(operators/retrieval.py — extraction phase 5, round 12).

Hand-built NON-registry corpora with non-default column names and
non-registry parameters (k1/b/terms/depth/k/λ/rounds), pure-Python
reference twins for every scorer (the test_curation_lib.py pattern).
The registry queries stay covered by tests/test_parity.py's oracle gate.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators import retrieval

DOCS = [
    (1, "spark shuffle join join hash"),
    (2, "hash join hash join hash join"),
    (3, "stream stream stream watermark state"),
    (4, "the quick brown fox"),
    (5, "join"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["id", "body"])


def rfix(x: float, d: int) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


# ---------------------------------------------------------------------------
# bm25 vs python twin at non-default k1/b
# ---------------------------------------------------------------------------


def _py_bm25(terms, k1, b):
    toks = {i: t.split() for i, t in DOCS}
    dlen = {i: float(len(t)) for i, t in toks.items()}
    n_docs = float(len(DOCS))
    avg_len = sum(dlen.values()) / n_docs
    out = {}
    for i, t in toks.items():
        score = 0.0
        matched = False
        for term in terms:
            tf = float(t.count(term))
            if tf == 0:
                continue
            matched = True
            df = float(sum(1 for tt in toks.values() if term in tt))
            idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1)
            score += (idf * tf * (k1 + 1)
                      / (tf + k1 * (1 - b + b * dlen[i] / avg_len)))
        if matched:
            out[i] = score
    return out


def test_bm25_scores_match_python_twin(spark, docs):
    terms, k1, b = ("join", "stream"), 0.9, 0.4  # non-registry knobs
    out = {r["id"]: r["score"]
           for r in retrieval.bm25_scores(docs, terms, "body", "id",
                                          k1=k1, b=b).collect()}
    expect = _py_bm25(terms, k1, b)
    assert set(out) == set(expect)  # only matching docs scored
    for i in expect:
        assert out[i] == pytest.approx(expect[i], rel=1e-9)


def test_bm25_b_dials_length_normalization(spark, docs):
    # b=0: no length normalization -> doc 2 (3x join) beats doc 5 (1x);
    # the saturated tf still orders by raw count
    s0 = {r["id"]: r["score"] for r in retrieval.bm25_scores(
        docs, ("join",), "body", "id", k1=1.2, b=0.0).collect()}
    assert s0[2] > s0[5]
    # b=1: full normalization boosts the SHORT doc 5 (dlen 1 vs avg ~4.4)
    s1 = {r["id"]: r["score"] for r in retrieval.bm25_scores(
        docs, ("join",), "body", "id", k1=1.2, b=1.0).collect()}
    assert s1[5] > s0[5]  # short doc gains under normalization


def test_bm25_topk_ranked_and_bounded(spark, docs):
    top = retrieval.bm25_topk(docs, ("join",), "body", "id", topk=2,
                              digits=4, score_col="s")
    rows = top.collect()
    assert len(rows) == 2
    assert rows[0]["s"] >= rows[1]["s"]


# ---------------------------------------------------------------------------
# rank_topk + rrf_fuse (3 legs — the N-ary contract)
# ---------------------------------------------------------------------------


def test_rank_topk_depth_and_ties(spark):
    scored = spark.createDataFrame(
        [(1, 0.5), (2, 0.5), (3, 0.9), (4, 0.1)], ["id", "sc"])
    out = [(r["id"], r["rk"]) for r in retrieval.rank_topk(
        scored, "sc", "id", depth=3, rank_col="rk").orderBy("rk").collect()]
    # 0.9 first; the 0.5 tie breaks by id; depth cuts 4
    assert out == [(3, 1), (1, 2), (2, 3)]


def test_rrf_fuse_three_legs_matches_python_twin(spark):
    legs = {
        "ra": {1: 1, 2: 2, 3: 3},
        "rb": {2: 1, 4: 2},
        "rc": {3: 1, 1: 2, 4: 3},
    }
    frames = [
        (spark.createDataFrame([(d, r) for d, r in leg.items()], ["id", rc]), rc)
        for rc, leg in legs.items()
    ]
    k = 10  # non-registry fusion constant
    out = {r["id"]: r for r in retrieval.rrf_fuse(
        frames, id_col="id", k=k, topk=4, digits=6).collect()}
    for i in (1, 2, 3, 4):
        expect = sum(1.0 / (k + leg[i]) for leg in legs.values() if i in leg)
        assert out[i]["rrf_score"] == pytest.approx(rfix(expect, 6), abs=1e-6)
    # absent legs are NULL rank, zero contribution
    assert out[4]["ra"] is None
    # doc in all three legs outranks docs in fewer
    ranked = sorted(out.values(), key=lambda r: -r["rrf_score"])
    assert ranked[0]["id"] in (1, 2, 3)


def test_rrf_fuse_requires_a_leg(spark):
    with pytest.raises(ValueError):
        retrieval.rrf_fuse([])


# ---------------------------------------------------------------------------
# mmr_select vs a python greedy twin
# ---------------------------------------------------------------------------

POOL = [(1, 10), (2, 9), (3, 8), (4, 3)]
TOKSETS = {
    1: {"a", "b", "c", "d"},
    2: {"a", "b", "c", "e"},   # near-dup of 1
    3: {"x", "y", "z"},        # diverse
    4: {"a", "x"},
}


def _py_mmr(rounds, lam, digits=6):
    canon = 10 ** digits
    rel = dict(POOL)
    selected, out = [], []
    s1 = max(rel, key=lambda i: (rel[i], -i))
    selected.append(s1)
    out.append((1, s1, rel[s1], rfix(float(rel[s1]), digits)))
    for r in range(2, rounds + 1):
        best = None
        for i in rel:
            if i in selected:
                continue
            jmax = max(
                len(TOKSETS[i] & TOKSETS[s]) / len(TOKSETS[i] | TOKSETS[s])
                for s in selected
            )
            score = rel[i] - lam * jmax
            key = (math.floor(score * canon + 0.5), -i)
            if best is None or key > best[0]:
                best = (key, i, score)
        out.append((r, best[1], rel[best[1]], rfix(best[2], digits)))
        selected.append(best[1])
    return out


@pytest.fixture(scope="module")
def mmr_frames(spark):
    pool = spark.createDataFrame(POOL, ["did", "r"])
    toks = spark.createDataFrame(
        [(i, t) for i, ts in TOKSETS.items() for t in ts], ["did", "tk"])
    return pool, toks


def test_mmr_select_matches_python_twin(spark, mmr_frames):
    pool, toks = mmr_frames
    out = [(r["rank"], r["did"], r["r"], r["sc"]) for r in retrieval.mmr_select(
        pool, toks, rounds=4, lam=2.0, id_col="did", rel_col="r",
        tok_col="tk", score_col="sc").orderBy("rank").collect()]
    expect = _py_mmr(4, 2.0)
    assert len(out) == 4
    for got, exp in zip(out, expect):
        assert got[:3] == exp[:3]
        assert got[3] == pytest.approx(exp[3], abs=1e-6)


def test_mmr_lambda_zero_is_pure_relevance(spark, mmr_frames):
    pool, toks = mmr_frames
    picks = [r["did"] for r in retrieval.mmr_select(
        pool, toks, rounds=3, lam=0.0, id_col="did", rel_col="r",
        tok_col="tk").orderBy("rank").collect()]
    assert picks == [1, 2, 3]  # relevance order, no diversification


def test_mmr_large_lambda_diversifies(spark, mmr_frames):
    pool, toks = mmr_frames
    picks = [r["did"] for r in retrieval.mmr_select(
        pool, toks, rounds=2, lam=10.0, id_col="did", rel_col="r",
        tok_col="tk").orderBy("rank").collect()]
    # doc 2 (near-dup of the first pick) is skipped for the diverse doc 3
    assert picks == [1, 3]
