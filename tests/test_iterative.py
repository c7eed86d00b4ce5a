"""operators/iterative: the shared flat-plan loop discipline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.iterative import checkpointed_loop, pin


def test_pin_cuts_lineage_flat(spark):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    pinned = pin(df, label="test")
    plan = pinned._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan
    assert pinned.count() == 100


def test_loop_plans_stay_flat_across_rounds(spark):
    """The regression the helper exists for: after R rounds where each
    round consumes the state TWICE, the final plan must still contain
    zero FileScans and a bounded operator count (unpinned, the subtree
    doubles per round)."""
    state = pin(spark.range(64).select(F.col("id").alias("v")), "init")

    def step(s, _i):
        # two consumers of the state per round — the geometric case
        big = s.filter(F.col("v") % 2 == 0)
        return s.join(big, "v", "left_semi")

    out = checkpointed_loop(state, step, 6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan
    assert plan.count("Scan ExistingRDD") <= 1
    assert out.count() == 32


def test_loop_stop_predicate_short_circuits(spark):
    calls = []

    def step(s, i):
        calls.append(i)
        return s

    def stop(new, old):
        return len(calls) >= 2

    state = spark.range(10)
    checkpointed_loop(state, step, 100, stop=stop)
    assert calls == [0, 1]


def test_loop_runs_exactly_max_rounds(spark):
    calls = []

    def step(s, i):
        calls.append(i)
        return s.filter(F.col("id") >= i)

    out = checkpointed_loop(spark.range(10), step, 3)
    assert calls == [0, 1, 2]
    assert out.count() == 8  # filtered at id>=2 last
