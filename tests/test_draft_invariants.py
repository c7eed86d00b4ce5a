"""Semantic invariants for the round-5-late drafts — properties the
oracle hash can't state (it only proves Spark ≡ DuckDB; these pin what
BOTH must satisfy), same spirit as tests/test_sessions_invariants.py."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.parity import SF_TEST_DIR
from yelpdatawarehouse_spark.queries.drafts_r6 import (
    DRAFTS,
    PPJ_TAU,
    RULE_MIN_SUP,
)
from yelpdatawarehouse_spark.sources.tables import table


def _rows(spark, name):
    fn, _ = DRAFTS[name]
    return fn(spark, SF_TEST_DIR).collect()




def test_gini_bounds(spark):
    rows = _rows(spark, "diag_gini_spend_by_nation")
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        assert r.n_customers >= 1


def test_benford_is_a_distribution(spark):
    rows = _rows(spark, "diag_benford_totalprice")
    assert len(rows) == 9
    assert abs(sum(r.benford_p for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.observed_p for r in rows) - 1.0) < 1e-3
    assert all(r.chi2_contrib >= 0 for r in rows)


def test_chi2_grid_is_total(spark):
    rows = _rows(spark, "a_chi2_priority_status")
    n_orders = table(spark, SF_TEST_DIR, "orders").count()
    n_p = len({r.priority for r in rows})
    n_s = len({r.status for r in rows})
    assert len(rows) == n_p * n_s, "grid must include zero-observed cells"
    assert sum(r.observed for r in rows) == n_orders
    assert abs(sum(r.expected for r in rows) - n_orders) < 0.01 * n_orders
    assert all(r.chi2_contrib >= 0 for r in rows)


def test_attribution_conserves_purchases(spark):
    rows = _rows(spark, "t15_last_touch_attribution")
    n_purchases = (
        table(spark, SF_TEST_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r.n_purchases for r in rows) == n_purchases
    assert all(r.channel != "purchase" for r in rows)


def test_cumulative_users_telescopes(spark):
    rows = sorted(_rows(spark, "t16_cumulative_unique_users"), key=lambda r: r.day)
    total_users = (
        table(spark, SF_TEST_DIR, "events").select("user_id").distinct().count()
    )
    run = 0
    for r in rows:
        run += r.new_users
        assert r.cumulative_users == run
        assert r.active_users <= r.cumulative_users
    assert rows[-1].cumulative_users == total_users


def test_association_rules_shape(spark):
    rows = _rows(spark, "j21_association_rules")
    assert rows and len(rows) % 2 == 0, "every rule has its reverse"
    directed = {(r.antecedent, r.consequent) for r in rows}
    assert len(directed) == len(rows)
    for r in rows:
        assert (r.consequent, r.antecedent) in directed
        assert r.n_baskets >= RULE_MIN_SUP
        assert 0.0 < r.confidence <= 1.0
        assert r.lift > 0.0


def test_ppjoin_pairs_are_canonical_and_thresholded(spark):
    rows = _rows(spark, "dedup_prefix_filter_jaccard")
    assert rows
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.jaccard >= PPJ_TAU



def test_interarrival_percentiles_ordered(spark):
    rows = _rows(spark, "t17_interarrival_profile")
    assert rows
    for r in rows:
        assert 0 <= r.median_gap_s <= r.p90_gap_s <= r.max_gap_s


def test_mad_outliers_beyond_cut(spark):
    from yelpdatawarehouse_spark.queries.drafts_r6 import MAD_CUT

    rows = _rows(spark, "a_mad_outlier_events")
    assert rows, "the synthetic event values have genuine tails"
    assert all(abs(r.modified_z) > MAD_CUT for r in rows)


def test_pmi_topk_is_ranked(spark):
    from yelpdatawarehouse_spark.queries.drafts_r6 import PMI_MIN_COUNT, PMI_TOPK

    rows = _rows(spark, "text_pmi_collocations")
    assert 0 < len(rows) <= PMI_TOPK
    assert all(r.n_pair >= PMI_MIN_COUNT for r in rows)
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_acf_is_a_correlation(spark):
    rows = sorted(_rows(spark, "t19_acf_daily_orders"), key=lambda r: r.lag)
    assert [r.lag for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    n_days = None
    for r in rows:
        assert -1.0 <= r.acf <= 1.0
        if n_days is None:
            n_days = r.n_pairs + 1
        assert r.n_pairs == n_days - r.lag, "each lag loses exactly lag pairs"


def test_cusum_telescopes_to_zero(spark):
    rows = sorted(_rows(spark, "t20_cusum_daily_revenue"), key=lambda r: r.day)
    assert rows
    # sum of deviations from the mean over the WHOLE series is zero
    assert abs(rows[-1].cusum) < 0.01 * max(abs(r.cusum) for r in rows) + 1.0
    assert sum(1 for r in rows if r.is_changepoint) >= 1
    peak = max(abs(r.cusum) for r in rows)
    assert all(abs(r.cusum) == peak for r in rows if r.is_changepoint)


def test_bootstrap_confidence_distribution(spark):
    from yelpdatawarehouse_spark.queries.drafts_r6 import BOOT_B

    rows = _rows(spark, "ml_bootstrap_mean_ci")
    assert len(rows) == BOOT_B
    orders = table(spark, SF_TEST_DIR, "orders")
    n = orders.count()
    true_mean = orders.agg(F.avg("o_totalprice")).first()[0]
    for r in rows:
        # Poisson(1) weights: effective n concentrates around n
        assert 0.8 * n < r.n_eff < 1.2 * n
        # each resampled mean stays near the estimand
        assert abs(r.boot_mean - true_mean) < 0.2 * true_mean
    # the replicates form a DISTRIBUTION, not one repeated value
    assert len({r.boot_mean for r in rows}) > 1


def test_psi_bins_conserve_and_contribs_nonneg(spark):
    rows = _rows(spark, "diag_psi_priority_drift")
    orders = table(spark, SF_TEST_DIR, "orders")
    n_ref = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    n_cmp = orders.count() - n_ref
    assert sum(r.n_ref for r in rows) == n_ref
    assert sum(r.n_cmp for r in rows) == n_cmp
    assert len(rows) == 10, "decile edges must produce all ten bins"
    for r in rows:
        # PSI contributions are individually non-negative by Gibbs
        if r.psi_contrib is not None:
            assert r.psi_contrib >= 0
        # deciles of the reference hold ~10% of the reference each
        assert abs(r.n_ref - 0.1 * n_ref) <= 0.02 * n_ref + 2


def test_skyline_is_pairwise_nondominating(spark):
    rows = _rows(spark, "o7_pareto_front_orders")
    assert rows
    pts = [(r.order_date, r.o_totalprice) for r in rows]
    for d1, p1 in pts:
        for d2, p2 in pts:
            assert not (d2 > d1 and p2 > p1), "front contains a dominated point"
    # the single most expensive order can never be dominated on price
    orders = table(spark, SF_TEST_DIR, "orders")
    max_price = orders.agg(F.max("o_totalprice")).first()[0]
    assert any(abs(p - max_price) < 1e-9 for _, p in pts)


def test_minhash_pr_eval_is_a_confusion_summary(spark):
    (r,) = _rows(spark, "dedup_minhash_pr_eval")
    assert r.n_hit <= r.n_true and r.n_hit <= r.n_cand
    if r.n_cand:
        assert abs(r.precision - r.n_hit / r.n_cand) < 1e-4
    if r.n_true:
        assert abs(r.recall - r.n_hit / r.n_true) < 1e-4
        assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.recall <= 1.0


def test_curation_v2_funnel_shrinks(spark):
    rows = _rows(spark, "pipeline_curation_v2")
    assert rows
    n_docs = table(spark, SF_TEST_DIR, "documents").count()
    assert sum(r.n_input for r in rows) == n_docs
    for r in rows:
        # each stage can only discard: input >= unique-quality >= kept
        assert r.n_input >= r.n_unique_quality >= r.n_kept >= 0
        assert (r.tokens_kept > 0) == (r.n_kept > 0)


def test_markov_rows_are_distributions(spark):
    from collections import defaultdict

    by_from = defaultdict(float)
    n_types = set()
    for r in _rows(spark, "t13_event_transition_matrix"):
        assert r.n_transitions >= 1
        assert 0.0 < r.p_transition <= 1.0
        by_from[r.from_type] += r.p_transition
        n_types.add(r.from_type)
    assert n_types
    for ft, s in by_from.items():
        # row-normalized probabilities sum to 1 (4dp canonicalization slack)
        assert abs(s - 1.0) < 5e-3, f"{ft} row sums to {s}"


def test_ewma_within_observed_spend_range(spark):
    lo, hi = (
        table(spark, SF_TEST_DIR, "orders")
        .agg(F.min("o_totalprice"), F.max("o_totalprice"))
        .first()
    )
    rows = _rows(spark, "w9_ewma_customer_spend")
    assert rows
    for r in rows:
        # a convex combination of a customer's order values stays in range
        assert lo - 1e-6 <= r.ewma_spend <= hi + 1e-6


def test_calibration_bins_are_probability_shaped(spark):
    rows = sorted(_rows(spark, "ml_calibration_bins"), key=lambda r: r.bin)
    assert rows
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.mean_predicted <= 1.0
        assert 0.0 <= r.frac_positive <= 1.0
        # the bin's mean prediction must lie inside the bin's own range
        assert r.bin / 10 - 1e-6 <= r.mean_predicted <= (r.bin + 1) / 10 + 1e-6


def test_theta_overlap_set_algebra(spark):
    rows = _rows(spark, "a_theta_audience_overlap")
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        assert 0 <= r.n_intersect <= r.n_union


def test_containment_pairs_bounds(spark):
    rows = _rows(spark, "dedup_containment_pairs")
    assert rows
    for r in rows:
        assert r.doc_a != r.doc_b
        assert 0 < r.shared <= min(r.n_a, r.n_b)
        assert 0.0 < r.containment <= 1.0


def test_cohort_matrix_monotone_from_birth(spark):
    from collections import defaultdict

    cohorts = defaultdict(dict)
    for r in _rows(spark, "a_cohort_retention_matrix"):
        cohorts[r.cohort_month][r.age_months] = r.n_active
    assert cohorts
    for month, ages in cohorts.items():
        assert 0 in ages, f"cohort {month} lacks its birth row"
        # no later age can exceed the cohort's size at birth
        assert all(n <= ages[0] for n in ages.values())


def test_jl_projection_distortion_consistent(spark):
    rows = _rows(spark, "emb_jl_projection_fidelity")
    assert rows
    for r in rows:
        assert r.d2_orig > 0
        # distortion column must equal the ratio it summarizes
        assert abs(r.distortion - r.d2_proj / r.d2_orig) < 1e-3
