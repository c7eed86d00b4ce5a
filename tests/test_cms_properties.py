"""Differential check of the CMS operator against an independent
pure-Python model (the suite's pattern for hash-algorithm operators:
test_corpus_invariants-style model twins catch misconceptions a SQL
oracle built from the same mental model could share)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from yelpdatawarehouse_spark.operators.cms import cms_build, cms_estimate

DEPTH, WIDTH = 3, 16  # narrow on purpose: forces collisions


def _py_bucket(value: str, seed: int, width: int) -> int:
    h = int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:15], 16)
    return h % width


def _py_cms(values: list[int]) -> dict:
    counters: dict = {}
    for v in values:
        for seed in range(DEPTH):
            b = _py_bucket(str(v), seed, WIDTH)
            counters[(seed, b)] = counters.get((seed, b), 0) + 1
    return counters


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60))
def test_spark_counters_equal_python_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "k long")
    got = {
        (r["seed"], r["bucket"]): r["c"]
        for r in cms_build(df, "k", depth=DEPTH, width=WIDTH).collect()
    }
    assert got == _py_cms(values)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60))
def test_estimates_match_python_min_over_rows(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "k long")
    sketch = cms_build(df, "k", depth=DEPTH, width=WIDTH)
    got = {
        r["k"]: r["cms_est"]
        for r in cms_estimate(
            sketch, df.distinct(), "k", depth=DEPTH, width=WIDTH
        ).collect()
    }
    counters = _py_cms(values)
    exact: dict = {}
    for v in values:
        exact[v] = exact.get(v, 0) + 1
    for v in set(values):
        want = min(
            counters.get((seed, _py_bucket(str(v), seed, WIDTH)), 0)
            for seed in range(DEPTH)
        )
        assert got[v] == want
        assert got[v] >= exact[v]
