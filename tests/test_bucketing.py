"""Bucketed layout: the join between two same-bucketed tables must contain
no shuffle Exchange, and results must match the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.bucketing import (
    bucketed_join,
    plan_has_shuffle,
    write_bucketed,
)
from yelpdatawarehouse_spark.sources.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    whd = tmp_path_factory.mktemp("bucket_wh")
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    od = table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    write_bucketed(
        li, "li_b", key="l_orderkey", n_buckets=8, sort_by="l_orderkey",
        path=str(whd / "li_b"),
    )
    write_bucketed(
        od.withColumnRenamed("o_orderkey", "l_orderkey"),
        "od_b",
        key="l_orderkey",
        n_buckets=8,
        sort_by="l_orderkey",
        path=str(whd / "od_b"),
    )
    yield "li_b", "od_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    li_b, od_b = bucketed_tables
    # disable broadcast so the sort-merge path (where bucketing matters) engages
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, li_b, od_b, "l_orderkey")
        assert not plan_has_shuffle(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_plain_join_shuffles(spark):
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    od = table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    # force non-broadcast so the contrast is shuffle vs bucket co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert plan_has_shuffle(li.join(od, "l_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_results_match(spark, bucketed_tables):
    li_b, od_b = bucketed_tables
    got = bucketed_join(spark, li_b, od_b, "l_orderkey")
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    od = table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey", "o_totalprice"
    )
    want = li.join(od, "l_orderkey")
    assert got.count() == want.count()
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_bucketed_groupby_no_shuffle(spark, bucketed_tables):
    li_b, _ = bucketed_tables
    agg = spark.table(li_b).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert not plan_has_shuffle(agg)
