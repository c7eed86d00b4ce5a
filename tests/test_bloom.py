"""Bloom semi-join operator (operators/bloom.py): exact equivalence with a
plain semi-join on the verify path, no-false-negative / tunable-false-
positive behavior on the prefilter path, and the broadcast-only plan shape
that makes it the scale answer for dimension-membership filters."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators.bloom import (
    bloom_bitmap,
    bloom_semi_join,
)


def _probe_build(spark):
    probe = spark.range(0, 5000).select(
        (F.col("id") % 499).alias("key"), F.col("id").alias("v")
    )
    build = spark.range(0, 120).select((F.col("id") * 3).alias("key"))
    return probe, build


def test_verify_path_equals_plain_semi_join(spark):
    probe, build = _probe_build(spark)
    exact = sorted(map(tuple, probe.join(build.distinct(), "key", "left_semi").collect()))
    got = sorted(map(tuple, bloom_semi_join(probe, build, "key").collect()))
    assert got == exact and len(exact) > 0


def test_prefilter_has_no_false_negatives(spark):
    probe, build = _probe_build(spark)
    exact = set(map(tuple, probe.join(build.distinct(), "key", "left_semi").collect()))
    # tiny bitmap -> false positives guaranteed, false negatives never
    loose = set(
        map(tuple, bloom_semi_join(probe, build, "key", n_bits=64, k=2, verify=False).collect())
    )
    assert exact <= loose
    assert len(loose) > len(exact)  # 64 bits for 120 keys must saturate


def test_default_sizing_keeps_false_positives_negligible(spark):
    probe, build = _probe_build(spark)
    exact = set(map(tuple, probe.join(build.distinct(), "key", "left_semi").collect()))
    default = set(map(tuple, bloom_semi_join(probe, build, "key", verify=False).collect()))
    # 128Ki bits / 120 keys -> theoretical FP rate ~1e-15; demand exactness here
    assert default == exact


def test_bitmap_is_one_row_and_bounded(spark):
    _, build = _probe_build(spark)
    rows = bloom_bitmap(build, "key", n_bits=1 << 12, k=4).collect()
    assert len(rows) == 1
    bitmap = rows[0]["__bloom"]
    assert len(bitmap) == (1 << 12) // 64  # dense fixed-length array
    assert all(isinstance(w, int) for w in bitmap)
    assert any(w != 0 for w in bitmap)


def test_prefilter_plan_is_broadcast_only(spark):
    """The prefilter must reach the probe side as a broadcast + filter —
    no hash-exchange of the probe table before the membership test."""
    probe, build = _probe_build(spark)
    pre = bloom_semi_join(probe, build, "key", verify=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pre.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # probe side feeds the join straight from the range scan: the only
    # hash exchanges allowed are on the bitmap build side (word groupBy)
    assert plan.count("Exchange hashpartitioning") <= 1
