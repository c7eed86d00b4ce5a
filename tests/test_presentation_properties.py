"""Property-based checks (hypothesis) for the presentation-edge rounding
layer — the portability foundation every oracle hash-match rests on.

No Spark needed: rfix/cavg are pure IEEE-754 arithmetic by design, so the
properties are checked directly in Python and cross-checked against DuckDB
evaluating the exact SQL renderings (rfix_sql/cavg_sql) on the same values.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# 2-decimal "money" quantities, the dominant emitted dtype
money_lists = st.lists(
    st.integers(min_value=-(10**7), max_value=10**7).map(lambda c: c / 100),
    min_size=1,
    max_size=60,
)


def _rfix(x: float, n: int = 2) -> float:
    p = 10**n
    return math.floor(x * p + 0.5) / p


def _cavg(s: float, cnt: int, n: int = 2) -> float:
    return _rfix(_rfix(s, 2) / cnt, n)


@settings(max_examples=200, deadline=None)
@given(money_lists)
def test_rfix_of_money_sum_is_summation_order_invariant(vals):
    """The mid-quantum argument: a sum of 0.01-quantized values lands ~half
    a quantum from any floor boundary, so ANY summation order rounds the
    same — the property that makes rfix(sum(money)) hash-stable across
    Spark partitionings."""
    base = _rfix(sum(vals))
    assert _rfix(sum(reversed(vals))) == base
    shuffled = list(vals)
    for seed in (1, 2):
        random.Random(seed).shuffle(shuffled)
        assert _rfix(sum(shuffled)) == base


@settings(max_examples=200, deadline=None)
@given(money_lists)
def test_cavg_is_summation_order_invariant(vals):
    """cavg derives the average from the rounded sum, so it inherits the
    order-invariance rfix(avg(...)) does NOT have (the round-3 a3 flake)."""
    cnt = len(vals)
    base = _cavg(sum(vals), cnt)
    shuffled = list(vals)
    for seed in (1, 2):
        random.Random(seed).shuffle(shuffled)
        assert _cavg(sum(shuffled), cnt) == base


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=100, deadline=None)
@given(money_lists)
def test_rfix_and_cavg_match_duckdb_sql_rendering(vals):
    """Python reference == DuckDB executing the exact SQL strings the
    oracles embed (rfix_sql / cavg_sql), on the same values."""
    from yelpdatawarehouse_spark.functions.presentation import cavg_sql, rfix_sql

    c = duckdb.connect()
    c.execute("CREATE TABLE t (v DOUBLE)")
    c.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    got_sum = c.execute(f"SELECT {rfix_sql('sum(v)')} FROM t").fetchone()[0]
    got_avg = c.execute(f"SELECT {cavg_sql('sum(v)', 'count(v)')} FROM t").fetchone()[0]
    assert got_sum == _rfix(sum(vals))
    assert got_avg == _cavg(sum(vals), len(vals))
