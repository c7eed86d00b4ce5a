"""Hostile-timezone gate for the timestamp-touching drafts.

The external driver builds a BARE SparkSession whose JVM timezone is
whatever the host has (the round-2 bench crashed on exactly this); the
engine's defense is that sources/tables.table() pins
spark.sql.session.timeZone=UTC on whatever session it is handed. This
test re-runs every draft that reads events.ts under a session whose
timezone was switched to America/New_York BEFORE the query plans, and
demands the DuckDB oracle still hash-match."""

from __future__ import annotations

import pytest

from tests.parity import SF_TEST_DIR, compare
from yelpdatawarehouse_spark.queries.draft_layer import all_drafts

DRAFTS = all_drafts()

_TS_DRAFTS = (
    "j30_forecast_revenue_q6",
    "j31_volume_shipping_q7",
    "j32_market_share_q8",
    "t33_page_hinkley_drift",
    "j24_shipping_priority_q3",
    "j25_returned_items_q10",
    "j26_promo_revenue_q14",
    "j29_large_volume_q18",
    "j22_top_supplier_q15",
    "t21_holt_linear_daily",
    "t22_weekday_seasonal_decompose",
    "a_runs_test_daily_revenue",
    "t25_kalman_local_level",
    "w12_rfm_segments",
    "t10_lateness_profile",
    "a_trailing_week_active_users",
    "a_trailing_week_active_sketch",
    "t12_gap_interpolation",
    "a_cohort_retention_matrix",
    "t13_event_transition_matrix",
    "t15_last_touch_attribution",
    "t16_cumulative_unique_users",
    "t17_interarrival_profile",
    "t19_acf_daily_orders",
    "t20_cusum_daily_revenue",
    # round-8 drafts touching o_orderdate / l_shipdate / events.ts
    "a_survival_hazard_curve",
    "a_open_orders_per_day",
    "t26_event_trigrams_topk",
    "t29_binary_segmentation_split",
    "j23_late_orders_q4",
    "a_mann_whitney_u",
    "t32_rolling_correlation",
    "a_pareto_8020_concentration",
    # round-11 drafts touching o_orderdate
    "w10_cume_dist_spend",
    "t34_theil_sen_trend",
)


@pytest.mark.parametrize("name", _TS_DRAFTS)
def test_draft_survives_non_utc_session(spark, name):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        fn, oracle = DRAFTS[name]
        problems = compare(fn(spark, SF_TEST_DIR), oracle, SF_TEST_DIR)
        assert not problems, f"{name} under non-UTC session:\n" + "\n".join(problems)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
