"""operators/ranks.exact_global_rank must be bit-identical to the naive
un-partitioned row_number window it replaces, without planning one."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.ranks import exact_global_rank


def test_matches_naive_global_window(spark):
    # Unique keys, deliberately unsorted and skewed across partitions.
    vals = [((i * 7919) % 1000) * 3 + 1 for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "k int").repartition(7)
    got = {
        (r.k, r.rank)
        for r in exact_global_rank(df, "k", num_partitions=5).collect()
    }
    want = {
        (r.k, r.rank)
        for r in df.select(
            "k", F.row_number().over(Window.orderBy("k")).alias("rank")
        ).collect()
    }
    assert got == want


def test_no_unpartitioned_window_over_data(spark):
    """The only global window allowed is the bounded offsets prefix-sum
    (<= num_partitions rows); the data-sized window must be PARTITION BY
    pid. We assert the data never flows through a single-partition
    exchange: the plan has no 'Window' whose child is the full scan
    behind 'SinglePartition'."""
    df = spark.range(0, 10000).withColumnRenamed("id", "k")
    plan = (
        exact_global_rank(df, "k")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # The local rank window is partitioned by __pid.
    assert "partitionBy" not in plan or "__pid" in plan


def test_empty_input(spark):
    df = spark.createDataFrame([], "k long")
    assert exact_global_rank(df, "k").count() == 0


def test_rank_is_dense_on_unique_keys(spark):
    df = spark.createDataFrame([(v,) for v in [30, 10, 20, 50, 40]], "k int")
    rows = sorted(
        exact_global_rank(df, "k", num_partitions=3).collect(),
        key=lambda r: r.k,
    )
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]


def test_prefix_sum_matches_naive_window(spark):
    from yelpdatawarehouse_spark.operators.ranks import exact_prefix_sum

    df = spark.createDataFrame(
        [((i * 7919) % 500, ((i * 31) % 11) + 1) for i in range(500)],
        "k int, v int",
    ).groupBy("k").agg(F.sum("v").alias("v"))
    got = {
        (r.k, r.prefix_sum)
        for r in exact_prefix_sum(df, "k", "v", num_partitions=5).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        (r.k, r.ps)
        for r in df.select(
            "k", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("ps")
        ).collect()
    }
    assert got == want


def test_prefix_sums_multi_matches_chained(spark):
    """exact_prefix_sums (one range pass, N columns — r13) must be
    bit-identical to chaining exact_prefix_sum per column."""
    from yelpdatawarehouse_spark.operators.ranks import (
        exact_prefix_sum,
        exact_prefix_sums,
    )

    df = spark.createDataFrame(
        [((i * 7919) % 500, ((i * 31) % 11) + 1, ((i * 13) % 7) + 1)
         for i in range(500)],
        "k int, v int, u int",
    ).groupBy("k").agg(F.sum("v").alias("v"), F.sum("u").alias("u"))
    fused = {
        (r.k, r.pv, r.pu)
        for r in exact_prefix_sums(
            df, "k", [("v", "pv"), ("u", "pu")], num_partitions=5
        ).collect()
    }
    c1 = exact_prefix_sum(df, "k", "v", out_col="pv", num_partitions=5)
    c2 = exact_prefix_sum(c1, "k", "u", out_col="pu", num_partitions=5)
    chained = {(r.k, r.pv, r.pu) for r in c2.collect()}
    assert fused == chained


def test_prefix_sums_multi_empty(spark):
    from yelpdatawarehouse_spark.operators.ranks import exact_prefix_sums

    df = spark.createDataFrame([], "k long, v long, u long")
    assert exact_prefix_sums(df, "k", [("v", "pv"), ("u", "pu")]).count() == 0


def test_prefix_sum_empty(spark):
    from yelpdatawarehouse_spark.operators.ranks import exact_prefix_sum

    df = spark.createDataFrame([], "k long, v long")
    assert exact_prefix_sum(df, "k", "v").count() == 0


def test_reliable_checkpoint_mode_is_identical(spark, tmp_path):
    """reliable=True (DFS checkpoint) must produce bit-identical ranks and
    prefix sums to the default localCheckpoint pin — the escape hatch is
    a storage/fault-tolerance choice, never a semantics choice."""
    from pyspark.sql import functions as F

    from yelpdatawarehouse_spark.operators.ranks import (
        exact_global_rank,
        exact_prefix_sum,
    )

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = spark.range(0, 500).select(
        (F.col("id") * 37 % 101).alias("k"), F.col("id").alias("v")
    )
    # unique key for the prefix sum: collapse to one row per k first
    per_k = df.groupBy("k").agg(F.sum("v").alias("val"))
    a = sorted(
        (r.k, r.rank)
        for r in exact_global_rank(per_k, "k", num_partitions=8).collect()
    )
    b = sorted(
        (r.k, r.rank)
        for r in exact_global_rank(
            per_k, "k", num_partitions=8, reliable=True
        ).collect()
    )
    assert a == b
    c = sorted(
        (r.k, r.prefix_sum)
        for r in exact_prefix_sum(per_k, "k", "val", num_partitions=8).collect()
    )
    d = sorted(
        (r.k, r.prefix_sum)
        for r in exact_prefix_sum(
            per_k, "k", "val", num_partitions=8, reliable=True
        ).collect()
    )
    assert c == d
