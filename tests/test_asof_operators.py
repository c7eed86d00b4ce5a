"""Unit tests for the reusable event-time join operators (operators/asof.py):
randomized brute-force checks on in-memory frames, both directions, with
deliberate equal-timestamp ties and empty-match keys."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.asof import asof_join, bucketed_range_join

BASE = dt.datetime(2024, 6, 1)
_OFF = [0, 1, 60, 3600, 7200, 24 * 3600 - 1, 24 * 3600, 25 * 3600]


def _frames(spark, seed):
    rng = random.Random(seed)
    left = [
        (rng.randrange(4), BASE + dt.timedelta(seconds=rng.choice(_OFF) + rng.choice(_OFF)), i)
        for i in range(60)
    ]
    right = [
        (rng.randrange(5), BASE + dt.timedelta(seconds=rng.choice(_OFF) + rng.choice(_OFF)), 100 + i)
        for i in range(60)
    ]
    ldf = spark.createDataFrame(left, ["k", "t", "lid"])
    rdf = spark.createDataFrame(right, ["k", "t", "rid"])
    return left, right, ldf, rdf


@pytest.mark.parametrize("seed", [3, 17])
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_brute_force(spark, seed, direction):
    left, right, ldf, rdf = _frames(spark, seed)
    out = asof_join(ldf, rdf, on="k", left_time="t", right_time="t", direction=direction)
    got = {r.lid: (r.asof.t if r.asof else None) for r in out.collect()}

    want = {}
    for k, t, lid in left:
        if direction == "backward":
            cands = [rt for rk, rt, _ in right if rk == k and rt <= t]
            want[lid] = max(cands) if cands else None
        else:
            cands = [rt for rk, rt, _ in right if rk == k and rt >= t]
            want[lid] = min(cands) if cands else None
    assert got == want


def test_asof_join_preserves_left_columns_and_payload(spark):
    ldf = spark.createDataFrame([(1, BASE, "a"), (2, BASE, "b")], ["k", "t", "tag"])
    rdf = spark.createDataFrame(
        [(1, BASE - dt.timedelta(seconds=5), 7.5)], ["k", "t", "score"]
    )
    out = asof_join(ldf, rdf, on="k", left_time="t", right_time="t").collect()
    by_k = {r.k: r for r in out}
    assert by_k[1].tag == "a" and by_k[1].asof.score == 7.5
    assert by_k[2].tag == "b" and by_k[2].asof is None


@pytest.mark.parametrize("seed", [3, 17])
def test_bucketed_range_join_matches_brute_force(spark, seed):
    left, right, ldf, rdf = _frames(spark, seed)
    W = 24 * 3600
    out = bucketed_range_join(
        ldf, rdf, on="k", left_time="t", right_time="t", window_seconds=W
    )
    got = sorted((r.lid, r.r_rid) for r in out.collect())
    want = sorted(
        (lid, rid)
        for k, t, lid in left
        for rk, rt, rid in right
        if rk == k and t <= rt < t + dt.timedelta(seconds=W)
    )
    assert got == want


def test_range_join_never_nested_loop(spark):
    """The operator's reason to exist: a raw inequality join plans as
    BroadcastNestedLoopJoin; the bucketed encoding must stay a hash join."""
    ldf = spark.createDataFrame([(1, BASE, 1)], ["k", "t", "lid"])
    rdf = spark.createDataFrame([(1, BASE, 2)], ["k", "t", "rid"])
    out = bucketed_range_join(ldf, rdf, on="k", left_time="t", right_time="t",
                              window_seconds=3600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_asof_join_single_exchange(spark):
    """asof_join's contract is ONE hash exchange on the key."""
    ldf = spark.createDataFrame([(1, BASE, 1)], ["k", "t", "lid"])
    rdf = spark.createDataFrame([(1, BASE, 2)], ["k", "t", "rid"])
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = asof_join(ldf, rdf, on="k", left_time="t", right_time="t")
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_asof_join_tie_break_is_deterministic(spark):
    """Multiple RIGHT rows at one (key, timestamp) — a versioned dim with
    duplicate valid_from — must carry a deterministic winner: the greatest
    payload struct by default, the greatest `tiebreak` column when given."""
    ldf = spark.createDataFrame([(1, BASE + dt.timedelta(seconds=10))], ["k", "t"])
    rdf = spark.createDataFrame(
        [(1, BASE, 2, "v2"), (1, BASE, 1, "v1"), (1, BASE, 3, "v3")],
        ["k", "t", "version", "name"],
    )
    for _ in range(3):  # stable across repeated runs/shuffles
        out = asof_join(ldf, rdf, on="k", left_time="t", right_time="t").collect()
        assert out[0].asof.version == 3 and out[0].asof.name == "v3"
    out = asof_join(
        ldf,
        rdf.select("k", "t", "name", "version"),  # name first in payload struct
        on="k", left_time="t", right_time="t", tiebreak="version",
    ).collect()
    assert out[0].asof.version == 3  # explicit tiebreak, not field order
