"""operators/quantiles.py: KLL sketch rollup — rank-envelope correctness
(never exact equality: KLL compaction is randomized by design)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.quantiles import (
    group_sketches,
    merge_rollup,
    rank_of,
)
from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.01"
# k=200 gives ~1.65% normalized rank error (one-sided, high probability);
# assert at 3x the bound so the test never flakes on an unlucky compaction
RANK_TOL = 0.05


@pytest.fixture(scope="module")
def orders_by_nation(spark):
    o = table(spark, SF, "orders")
    c = table(spark, SF, "customer")
    return o.join(
        F.broadcast(c.select("c_custkey", "c_nationkey")),
        o.o_custkey == F.col("c_custkey"),
    ).select("c_nationkey", "o_totalprice")


def test_merged_rollup_quantiles_within_rank_envelope(spark, orders_by_nation):
    """nation-level sketches merged to regions: each estimated quantile's
    EXACT rank in the region's raw data must sit near the target."""
    n2r = table(spark, SF, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
    )
    leaves = group_sketches(orders_by_nation, ["c_nationkey"], "o_totalprice")
    rolled = merge_rollup(
        leaves.join(F.broadcast(n2r), "c_nationkey"),
        ["n_regionkey"],
        [0.25, 0.5, 0.9],
    )
    raw = orders_by_nation.join(F.broadcast(n2r), "c_nationkey")
    for q in (0.25, 0.5, 0.9):
        col = f"q_{str(q).replace('.', '_')}"
        probe = rolled.select("n_regionkey", F.col(col).alias("est"))
        ranks = rank_of(
            raw, ["n_regionkey"], "o_totalprice", probe, "est"
        ).collect()
        assert len(ranks) == 5
        for r in ranks:
            assert abs(r.exact_rank - q) <= RANK_TOL, (q, r)


def test_merge_equals_direct_counts(spark, orders_by_nation):
    """n is exact through the merge (counts are not approximated)."""
    n2r = table(spark, SF, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
    )
    leaves = group_sketches(orders_by_nation, ["c_nationkey"], "o_totalprice")
    rolled = merge_rollup(
        leaves.join(F.broadcast(n2r), "c_nationkey"), ["n_regionkey"], [0.5]
    )
    got = {r.n_regionkey: r.n for r in rolled.collect()}
    exact = {
        r.n_regionkey: r.cnt
        for r in orders_by_nation.join(F.broadcast(n2r), "c_nationkey")
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == exact


def test_global_rollup_single_group(spark, orders_by_nation):
    leaves = group_sketches(orders_by_nation, ["c_nationkey"], "o_totalprice")
    rolled = merge_rollup(leaves.withColumn("all", F.lit(1)), ["all"], [0.5])
    row = rolled.collect()[0]
    assert row.n == orders_by_nation.count()
    probe = rolled.select("all", F.col("q_0_5").alias("est"))
    rank = rank_of(
        orders_by_nation.withColumn("all", F.lit(1)),
        ["all"], "o_totalprice", probe, "est",
    ).collect()[0]
    assert abs(rank.exact_rank - 0.5) <= RANK_TOL


def test_empty_input(spark):
    empty = spark.createDataFrame([], "g long, v double")
    leaves = group_sketches(empty, ["g"], "v")
    assert leaves.count() == 0
    assert merge_rollup(leaves, ["g"], [0.5]).count() == 0
