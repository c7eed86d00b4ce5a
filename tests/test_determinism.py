"""Cross-run determinism sweep: every registered query must produce the
SAME canonical result when re-executed under a different shuffle-partition
count.

This pins the bug class the oracle check can miss on a lucky run:
partition-order-dependent results (collect_set/first/struct-max without
canonicalization, float accumulation landing on a rounding boundary,
un-tie-broken windows or LIMITs). Changing spark.sql.shuffle.partitions
between executions reorders both task scheduling and merge order, so
anything order-sensitive flips here before it flakes in the driver.
"""

from __future__ import annotations

import math

import pytest

from tests import rotation
from tests.parity import SF_TEST_DIR
from yelpdatawarehouse_spark.queries import all_queries
from yelpdatawarehouse_spark.queries.registry import REGISTRY

all_queries()


def _canon(df):
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.collect()]

    def key(v):
        if v is None:
            return "~"
        if isinstance(v, float):
            return f"{v:.9g}"
        if isinstance(v, (list, tuple)):
            return repr([key(x) for x in v])
        return repr(v)

    rows.sort(key=lambda r: [key(v) for v in r])
    return cols, rows


def _same(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_same(x, y) for x, y in zip(a, b))
    return a == b


# r14: rotation-sampled like the other three registry-wide sweeps
# (tests/rotation.py) — 612 query executions (2 per query) no longer fit
# the external driver's verify window alongside the rest of the suite;
# a deterministic quarter rotates full coverage over four rounds and
# YDW_FULL_TESTS=1 (round-close protocol) restores the full sweep.
@pytest.mark.parametrize("name", rotation.sample(REGISTRY))
def test_rerun_is_identical(spark, name):
    qd = REGISTRY[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    cols1, rows1 = _canon(qd.fn(spark, SF_TEST_DIR))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        cols2, rows2 = _canon(qd.fn(spark, SF_TEST_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert cols1 == cols2
    assert len(rows1) == len(rows2), f"{name}: {len(rows1)} vs {len(rows2)} rows"
    for r1, r2 in zip(rows1, rows2):
        assert _same(r1, r2), f"{name}: row differs across partitionings:\n{r1}\n{r2}"
