"""Physical-plan regression guards.

A query can stay value-correct while its plan silently degrades (a lost
broadcast hint becomes a shuffled join; a rewrite doubles the exchanges;
column pruning stops reaching the scan) — at sf0.001 nothing notices, at
100 TB everything does. These tests pin the shuffle/broadcast/pruning
shape of the headline operators at the ceilings audited in PLANS.md, so a
plan regression fails CI instead of the next scale-up.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from tools.plan_report import audit  # noqa: E402

from yelpdatawarehouse_spark.queries import all_queries  # noqa: E402

SF = "/root/testdata/sf0.001"

# name -> (max shuffles, min broadcasts, max windows)
# Shuffle counts are CEILINGS (fewer is fine); broadcasts are FLOORS
# (a lost broadcast is exactly the regression we're guarding).
_SHAPES = {
    "j1_multiway_revenue": (1, 3, 0),
    "j5_copurchase_pairs": (3, 0, 0),
    # 3rd exchange is the salted hot-hub branch's repartition — empty at
    # runtime below J5_LARGE_BASKET, pruned by AQE (same shape as j5)
    "j6_two_hop_supplier_pairs": (3, 0, 0),
    "a14_customer_summary_rebuild": (1, 2, 0),
    "w3_running_avg_per_customer": (1, 0, 1),
    "t7_hourly_tumbling_window": (1, 0, 0),
    "g_pagerank_nations": (5, 15, 0),
    "t8_sessionization": (1, 0, 2),
    "j11_asof_join_last_view": (1, 0, 1),
    "j15_asof_next_purchase": (1, 0, 1),
    "g_triangle_support": (1, 2, 0),
    "j12_range_join_bucketed": (1, 1, 0),
    "dedup_minhash_lsh_candidates": (2, 1, 0),
    "ann_lsh_bucket_topk": (1, 1, 1),
    "text_pack_bins": (1, 0, 1),
    "mm_frame_sample": (0, 0, 0),
}


@pytest.fixture(scope="module")
def static_plans(spark):
    """Executed-plan strings with AQE off (AQE defers stage insertion, which
    would hide the static exchange structure being pinned here)."""
    registry = all_queries()
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield {
            name: registry[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
            for name in _SHAPES
        }
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


@pytest.mark.parametrize("name", sorted(_SHAPES))
def test_plan_shape(static_plans, name):
    max_shuffles, min_broadcasts, max_windows = _SHAPES[name]
    a = audit(static_plans[name])
    assert a["shuffles"] <= max_shuffles, f"{name}: {a['shuffles']} shuffles > {max_shuffles}"
    assert a["broadcasts"] >= min_broadcasts, (
        f"{name}: {a['broadcasts']} broadcasts < {min_broadcasts} — a dimension join "
        "probably lost its broadcast"
    )
    assert a["windows"] <= max_windows, f"{name}: {a['windows']} windows > {max_windows}"


def test_scan_pruning_reaches_parquet(static_plans):
    """j1's four scans must read only the joined/aggregated columns and all
    four must push filters — the canonical pushdown evidence."""
    a = audit(static_plans["j1_multiway_revenue"])
    assert len(a["scans"]) == 4
    assert all(len(cols) <= 3 for cols in a["scans"]), a["scans"]
    assert a["pushed"] == 4


def test_window_pair_shares_exchange(static_plans):
    """t8's lag + running-sum windows must ride ONE hash exchange on
    user_id — the single-shuffle sessionization contract."""
    a = audit(static_plans["t8_sessionization"])
    assert a["windows"] == 2 and a["shuffles"] == 1
