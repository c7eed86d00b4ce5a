"""operators/setsketch.py: theta-sketch set algebra — exact below sketch
capacity (planted sets), envelope above it."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.setsketch import (
    merged_distinct,
    pairwise_set_algebra,
    theta_group_sketches,
)


def _planted(spark):
    # A = 0..499, B = 250..749 (overlap 250), C = 1000..1099 (disjoint)
    rows = (
        [("A", i) for i in range(500)]
        + [("B", i) for i in range(250, 750)]
        + [("C", i) for i in range(1000, 1100)]
        + [("A", i) for i in range(100)]  # duplicates must not count
    )
    return spark.createDataFrame(rows, "src string, uid long")


def test_pairwise_algebra_exact_below_capacity(spark):
    sk = theta_group_sketches(_planted(spark), ["src"], "uid", lg_k=12)
    got = {
        (r.key_a, r.key_b): r for r in pairwise_set_algebra(sk, "src", lg_k=12).collect()
    }
    ab = got[("A", "B")]
    assert (ab.n_union, ab.n_intersect, ab.n_a_only, ab.n_b_only) == (
        750, 250, 250, 250,
    )
    assert abs(ab.jaccard - 250 / 750) < 1e-9
    ac = got[("A", "C")]
    assert (ac.n_union, ac.n_intersect) == (600, 0)
    assert ac.n_a_only == 500 and ac.n_b_only == 100
    bc = got[("B", "C")]
    assert bc.n_intersect == 0 and bc.n_union == 600


def test_union_rollup_matches_exact_distinct(spark):
    df = _planted(spark).withColumn("all", F.lit(1))
    sk = theta_group_sketches(df, ["src"], "uid", lg_k=12).withColumn(
        "all", F.lit(1)
    )
    got = merged_distinct(sk, ["all"]).collect()[0].n_distinct
    exact = df.select("uid").distinct().count()
    assert got == exact == 850


def test_estimation_regime_within_envelope(spark):
    """Past capacity (lg_k=4 -> 16 nominal entries) theta estimates; the
    relative error bound at lg_k=4 is loose, so assert a wide envelope —
    the point is graceful degradation, not precision."""
    rows = [("A", i) for i in range(5000)]
    df = spark.createDataFrame(rows, "src string, uid long")
    sk = theta_group_sketches(df, ["src"], "uid", lg_k=4).withColumn(
        "all", F.lit(1)
    )
    got = merged_distinct(sk, ["all"]).collect()[0].n_distinct
    assert 2500 <= got <= 10000


def test_empty_input(spark):
    empty = spark.createDataFrame([], "src string, uid long")
    sk = theta_group_sketches(empty, ["src"], "uid")
    assert sk.count() == 0
    assert pairwise_set_algebra(sk, "src").count() == 0


def test_union_gadget_capacity_follows_lg_k(spark):
    """Regression (r5 review): theta_union/theta_union_agg have their OWN
    nominal capacity (kernel default 2^12) — with lg_k=16 sketches whose
    union exceeds 4096, exactness must survive because lg_k is passed
    through to the union gadget too."""
    rows = [("A", i) for i in range(6000)] + [("B", i) for i in range(3000, 9000)]
    df = spark.createDataFrame(rows, "src string, uid long")
    sk = theta_group_sketches(df, ["src"], "uid", lg_k=16)
    pair = pairwise_set_algebra(sk, "src", lg_k=16).collect()[0]
    assert (pair.n_union, pair.n_intersect) == (9000, 3000)
    rolled = merged_distinct(sk.withColumn("all", F.lit(1)), ["all"], lg_k=16)
    assert rolled.collect()[0].n_distinct == 9000
