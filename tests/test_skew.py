"""Skew operators: salted join and salted exact distinct-count must be
result-identical to their unsalted forms on a synthetic hot-key dataset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.skew import salted_distinct_count, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 carries 50% of all rows (the hot key); values repeat
    big = spark.range(20_000).select(
        F.when(F.col("id") < 10_000, 0).otherwise((F.col("id") % 100) + 1).alias("k"),
        (F.col("id") % 37).alias("v"),
        F.col("id").alias("row_id"),
    )
    small = spark.range(101).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("label")
    )
    return big.cache(), small.cache()


def test_salted_join_matches_plain(skewed):
    big, small = skewed
    plain = big.join(small, "k").select("row_id", "k", "label")
    salted = salted_join(big, small, "k", n_salts=8).select("row_id", "k", "label")
    assert salted.count() == plain.count() == 20_000
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()


def test_salted_join_left(skewed):
    big, small = skewed
    # drop some dim rows → left join must preserve unmatched big rows as null
    small_partial = small.filter(F.col("k") < 50)
    plain = big.join(small_partial, "k", "left").select("row_id", "label")
    salted = salted_join(big, small_partial, "k", n_salts=4, how="left").select(
        "row_id", "label"
    )
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()


def test_salted_join_spreads_hot_key(skewed):
    big, small = skewed
    out = salted_join(big, small, "k", n_salts=8, salt_source="row_id")
    # the physical join key is (k, __salt): the hot key's rows hash to >1 salt
    salts = (
        big.withColumn("s", F.pmod(F.xxhash64(F.col("row_id").cast("string")), F.lit(8)))
        .filter(F.col("k") == 0)
        .select("s")
        .distinct()
        .count()
    )
    assert salts > 1  # hot key genuinely spread
    assert out.filter(F.col("k") == 0).count() == 10_000


def test_salted_distinct_count_exact(skewed):
    big, _ = skewed
    got = {r.k: r.distinct_cnt for r in salted_distinct_count(big, "k", "v").collect()}
    want = {
        r.k: r.cnt
        for r in big.groupBy("k").agg(F.countDistinct("v").alias("cnt")).collect()
    }
    assert got == want
    assert got[0] == 37  # hot key: all 37 distinct values
