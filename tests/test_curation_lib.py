"""Unit tests for the curation-funnel LIBRARY (operators/curation.py) on
hand-built, NON-registry DataFrames with non-default column names and
thresholds, checked against a local pure-Python reference of the same
gate → dedup → budget composition."""

from __future__ import annotations

import hashlib

import pytest

from yelpdatawarehouse_spark.operators import curation

STOP = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

ROWS = [
    # (id, domain, body)
    (1, "w", "the quick brown fox jumps over the lazy dog near a river bank"),
    (2, "w", "the quick brown fox jumps over the lazy dog near a river bank"),  # exact dup of 1
    (3, "w", "short text"),                                                      # fails length
    (4, "w", "x x x x x x x x x x x x"),                                        # fails diversity+stopwords
    (5, "v", "a steady stream of tokens keeps the curation gate honest for it"),
    (6, "v", "another long and reasonably diverse document for the budget to count in full"),
    (7, "v", "The Quick Brown Fox? jumps over the lazy dog near a river bank!"),  # normalizes == 1
]


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _norm(text: str) -> str:
    import re

    t = re.sub(r"[^a-z0-9\s]", "", text.lower())
    return re.sub(r"\s+", " ", t).strip()


def _reference(min_tokens, budget):
    """Pure-Python twin of curation_flags' verdicts."""
    meta = {}
    for i, g, body in ROWS:
        toks = body.split()
        q = (len(toks) >= min_tokens
             and len(set(toks)) / len(toks) >= 0.35
             and sum(t in STOP for t in toks) / len(toks) >= 0.01)
        meta[i] = dict(g=g, n=len(toks), q=q, fp=_norm(body),
                       pri=_md5_long(f"c:{i}"))
    uniq = set()
    by_fp: dict = {}
    for i in sorted(meta, key=lambda i: (not meta[i]["q"], i)):
        by_fp.setdefault(meta[i]["fp"], i)
    uniq = {i for fp, i in by_fp.items() if meta[i]["q"]}
    kept = set()
    for g in {m["g"] for m in meta.values()}:
        cum = 0
        for i in sorted((i for i in meta if meta[i]["g"] == g),
                        key=lambda i: (meta[i]["pri"], i)):
            if i in uniq:
                if cum < budget:
                    kept.add(i)
                cum += meta[i]["n"]
    return meta, uniq, kept


def test_curation_flags_match_reference(spark):
    df = spark.createDataFrame(ROWS, ["id", "domain", "body"])
    flags = curation.curation_flags(
        df, text_col="body", id_col="id", group_col="domain",
        min_tokens=10, budget=20, salt="c:",
    ).collect()
    meta, uniq, kept = _reference(min_tokens=10, budget=20)
    got_q = {r["id"] for r in flags if r["q"]}
    got_uniq = {r["id"] for r in flags if r["is_unique"]}
    got_kept = {r["id"] for r in flags if r["in_budget"]}
    assert got_q == {i for i in meta if meta[i]["q"]}
    assert got_uniq == uniq
    assert got_kept == kept
    # the exact-dup pair (1, 2) and the punctuation-normalized twin (7)
    # share a fingerprint: exactly one canonical among {1, 2, 7}
    assert len({1, 2, 7} & got_uniq) == 1


def test_curation_funnel_reconciles_with_flags(spark):
    df = spark.createDataFrame(ROWS, ["id", "domain", "body"])
    flags = curation.curation_flags(df, "body", "id", "domain",
                                    min_tokens=10, budget=20, salt="c:")
    fun = {r["domain"]: r.asDict()
           for r in curation.curation_funnel(flags, "domain").collect()}
    rows = flags.collect()
    for g in ("w", "v"):
        mine = [r for r in rows if r["domain"] == g]
        assert fun[g]["n_input"] == len(mine)
        assert fun[g]["n_quality"] == sum(r["q"] for r in mine)
        assert fun[g]["n_unique"] == sum(r["is_unique"] for r in mine)
        assert fun[g]["n_kept"] == sum(r["in_budget"] for r in mine)
        assert fun[g]["tokens_kept"] == sum(
            r["n_tokens"] for r in mine if r["in_budget"])
    # monotone funnel: input >= quality >= unique >= kept
    for g in fun:
        v = fun[g]
        assert v["n_input"] >= v["n_quality"] >= v["n_unique"] >= v["n_kept"]


def test_curated_corpus_is_the_in_budget_filter(spark):
    df = spark.createDataFrame(ROWS, ["id", "domain", "body"])
    flags = curation.curation_flags(df, "body", "id", "domain",
                                    min_tokens=10, budget=10**9, salt="c:")
    curated = {r["id"] for r in flags.filter("in_budget").collect()}
    # with an unbounded budget, curated == the unique quality survivors
    assert curated == {r["id"] for r in flags.collect() if r["is_unique"]}
