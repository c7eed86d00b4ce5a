"""Physical-plan pins for the round-5-late drafts — the same
ceiling/floor guard test_plan_shapes.py applies to the bench headliners,
extended to the dozen drafts added at the end of round 5 so a plan
regression is caught before (and after) their round-6 registration.

Semantics per tuple (identical to test_plan_shapes._SHAPES):
(max shuffles, min broadcasts, max windows, min pushed-filter scans) —
shuffle/window counts are CEILINGS, broadcast/pushed counts are FLOORS.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from tools.plan_report import audit  # noqa: E402

from yelpdatawarehouse_spark.queries.draft_layer import all_drafts  # noqa: E402

DRAFTS = all_drafts()

SF = "/root/testdata/sf0.001"

_SHAPES = {
    # two counting collapses; unigram sides + totals broadcast onto pairs
    "text_pmi_collocations": (2, 4, 0, 0),
    # two percentile reductions broadcast back; outlier filter is scan-side
    "a_mad_outlier_events": (0, 3, 0, 1),
    # three key-sized aggregates; the grid cross is broadcast-nested-loop
    "a_chi2_priority_status": (3, 3, 0, 1),
    # one user_id exchange feeds the ignore-nulls carry; channel rollup
    "t15_last_touch_attribution": (2, 0, 1, 0),
    # 9-digit grid join + total broadcast; both order scans pruned+pushed
    "diag_benford_totalprice": (1, 2, 0, 2),
    # spend rollup + nation-partitioned rank windows; nation dim broadcast
    "diag_gini_spend_by_nation": (3, 2, 2, 3),
    # first-seen + daily collapses; day-spine prefix-sum window
    "t16_cumulative_unique_users": (4, 1, 1, 0),
    # basket self-join pair counts + item-support joins; totals broadcast
    "j21_association_rules": (5, 6, 0, 2),
    # one (user,type) exchange for the lag; per-type percentile rollup
    "t17_interarrival_profile": (2, 0, 1, 0),
    # day-spine collapse, ONE lag window, stack() unpivot of one agg row
    "t19_acf_daily_orders": (1, 0, 1, 0),
    # day-spine collapse; mean + |S|-peak ride broadcasts; cumsum window
    "t20_cusum_daily_revenue": (1, 3, 2, 0),
    # 2·B codegen'd md5/CASE sums in ONE global aggregate — no exchange
    "ml_bootstrap_mean_ci": (0, 0, 0, 0),
    # decile edges + totals broadcast; pushed reference-priority filter
    "diag_psi_priority_drift": (1, 2, 0, 1),
    # --- round-7 drafts ---
    # pushed ship-date scan, one supplier rollup; max + dim broadcast
    "j22_top_supplier_q15": (2, 2, 0, 3),
    # model aggregates + token-keyed scoring join; class dim broadcast;
    # one bounded per-doc argmax window
    "ml_naive_bayes_confusion": (9, 4, 1, 6),
    # ONE value-domain collapse; cumulative + argmin windows are bounded
    # by the feature domain, not the fact count
    "ml_decision_stump_returns": (1, 1, 2, 0),
    # the whole model is one global aggregate — zero exchanges
    "ml_ridge_normal_eq": (0, 0, 0, 0),
    # day-spine collapse then a single fold — one exchange total
    "t21_holt_linear_daily": (1, 0, 0, 0),
    # token-keyed joins; doc-partitioned run-id window re-planned per
    # branch (4x); top-k is TakeOrdered, never a global sort
    "text_rake_keywords": (4, 3, 4, 1),
    # ONE fact exchange; day-spine windows; 7-row seasonal dim broadcast
    "t22_weekday_seasonal_decompose": (1, 2, 3, 0),
    # dim-keyed centroid aggregate; K*d model broadcast onto exploded
    # test vectors; bounded K-row argmax window
    "ml_nearest_centroid_eval": (5, 2, 1, 2),
    # day-spine collapse + lag window + one fixed-width aggregate
    "a_runs_test_daily_revenue": (1, 1, 1, 0),
    # frame explode + codegen byte-sum fold; doc-partitioned jump windows
    "mm_scene_cut_profile": (2, 2, 3, 1),
    # day-spine collapse then a single fold — one exchange (t21's shape)
    "t25_kalman_local_level": (1, 0, 0, 0),
    # customer rollup; max-date + dim broadcasts; segment-partitioned
    # quintile windows, histogram reuses that partitioning
    "w12_rfm_segments": (2, 2, 3, 2),
    # d-row moment broadcast onto exploded vectors; top-k is TakeOrdered
    "emb_mahalanobis_outliers": (2, 1, 0, 0),
    # two histogram collapses; length-support grid rides broadcasts;
    # source-partitioned ECDF window
    "text_ks_length_drift": (3, 3, 1, 1),
    # one (flag, price) collapse; group-partitioned cumulative windows
    "f16_weighted_median_price": (2, 0, 3, 0),
    # token-keyed first-seen + count aggregates; decile-row windows; the
    # doc rank runs on the id dimension via exact_global_rank (range
    # repartition + pid-local row_number + broadcast offsets: +3
    # exchanges, all on the dimension, none on the token stream; the
    # only global windows left are bounded to <=32 offset rows and the
    # 10 decile rows)
    # r8: exact_global_rank pins its ranged frame (correctness; see
    # operators/ranks.py) — the rank subtree is out of the visible plan,
    # but each downstream consumer re-joins the pinned rank (AQE-off
    # static plan counts every branch)
    "diag_heaps_vocab_growth": (14, 13, 10, 1),
    # two stump passes; stump-1 scalars broadcast over the second scan;
    # value-domain-bounded windows only
    "ml_boosting_round_stumps": (2, 7, 6, 0),
    # --- round-8 drafts ---
    # ONE source rollup + 1-row total broadcast — single-pass valuation
    "diag_loo_source_value": (1, 1, 0, 0),
    # one (flag, qty) collapse; value-domain cumulative windows (≤50 rows)
    "a_trimmed_mean_quantity": (2, 0, 2, 0),
    # bit-set distinct + probe joins ride broadcasts; m-bounded exchanges
    "diag_bloom_fpr_eval": (3, 4, 0, 5),
    # ONE user_id exchange feeds both lead windows; trigram-domain count
    "t26_event_trigrams_topk": (2, 0, 1, 0),
    # two d-row dimension aggregates, moments broadcast onto the explode
    "emb_geometric_median_step": (3, 3, 0, 2),
    # one cell collapse; 9-offset and core set ride broadcasts
    "emb_density_grid_cores": (3, 2, 0, 0),
    # panel broadcast onto one corpus scan; panel-sized vote windows
    "ml_knn_label_eval": (2, 1, 2, 2),
    # one day-keyed collapse; calendar-spine prefix windows; TakeOrdered
    "t29_binary_segmentation_split": (1, 0, 2, 0),
    # k corpus scans against broadcast 1-row seeds; argmax is TakeOrdered
    "emb_farthest_point_seeds": (0, 4, 0, 3),
    # ONE group-moment collapse; pooled moments broadcast back
    "diag_simpsons_slope_flip": (1, 1, 0, 0),
    # (nation, supplier) collapse + supplier-dim-sized total join
    "a_hhi_supplier_concentration": (4, 1, 0, 2),
    # per-row Arrow kernel: encode→decode→gate→runs, zero exchanges
    "mm_wav_silence_segments": (0, 0, 0, 0),
    # value collapse + exact_prefix_sum (range exchange, pid-local
    # window, bounded offsets window, broadcast add) — never an
    # un-partitioned window over the value domain
    "a_mann_whitney_u": (3, 2, 2, 1),
    # constant panel broadcast self-join; one global rollup
    "emb_intra_inter_margin": (0, 1, 0, 2),
    # --- round-9 drafts ---
    # one day-keyed collapse; six rolling moments share ONE spine window
    "t32_rolling_correlation": (1, 0, 1, 0),
    # one label-keyed collapse + 1-row total broadcast
    "sample_class_weights": (1, 1, 0, 0),
    # --- round-10 drafts: the TPC-H classics batch ---
    # pushed segment/date scans; customer + date-filtered orders broadcast;
    # one orderkey revenue exchange; TakeOrdered top-10
    "j24_shipping_priority_q3": (1, 2, 0, 3),
    # pushed returnflag/date scans; orders/customer/nation broadcast at
    # test scale; one custkey rollup exchange; TakeOrdered top-20
    "j25_returned_items_q10": (1, 3, 0, 4),
    # ship-month pruned scan; part dim broadcast; ONE conditional
    # aggregate pass, zero shuffles beyond the final 1-row reduce
    "j26_promo_revenue_q14": (0, 1, 0, 2),
    # one partkey collapse; global total is a 1-row broadcast of the
    # rollup (ReusedExchange, no second fact pass)
    "j27_important_parts_q11": (1, 1, 0, 0),
    # broadcast anti-join prunes bad suppliers pre-join; distinct +
    # count are bounded (brand,size,supplier) exchanges
    "j28_supplier_relationship_q16": (2, 2, 0, 3),
    # orderkey quantity rollup -> HAVING survivors broadcast into
    # orders/customer; single fact scan
    "j29_large_volume_q18": (1, 2, 0, 3),
    # --- round-10 drafts: new-capability batch ---
    # one source-keyed exchange; regex counting in codegen
    "text_readability_scores": (1, 0, 0, 0),
    "text_url_email_density": (1, 0, 0, 0),
    # day-keyed collapse + three ordered windows on the calendar spine
    "t33_page_hinkley_drift": (1, 0, 3, 0),
    # --- round-10 drafts: TPC-H completion batch ---
    # pure scan-filter-aggregate; every predicate pushed; zero shuffles
    "j30_forecast_revenue_q6": (0, 0, 0, 1),
    # j31/j32 promoted to the bench headline (pins now in test_plan_shapes)
    # custkey outer-join/count collapse + bounded count-of-counts rollup
    "a_custdist_q13": (2, 1, 0, 1),
    # DNF: part side pre-filtered to the bracket union before broadcast;
    # zero shuffles beyond the 1-row reduce
    "j33_bracket_revenue_q19": (0, 1, 0, 2),
    # snm_recall_eval / nprobe2_recall promoted to the bench headline
    # (pins now in test_plan_shapes)
    # ONE moment-sum pass, zero exchanges, two-column pruned scan
    "ml_pca_2d_closed_form": (0, 0, 0, 0),
    # per-row bit ops in codegen + one cell-keyed count; two-column scan
    "layout_zorder_cell_counts": (1, 0, 0, 0),
    # --- round-11 drafts (written round 9) ---
    # per-customer rollup exchange + ONE segment-partitioned window; the
    # customer dim rides a broadcast; both scans filter-pruned
    "w10_cume_dist_spend": (2, 1, 1, 2),
    # truth + sampled legs: two fp-bucket joins + two pair rollups; the
    # 1-row count digests ride broadcasts (panel filter pushed to scan)
    "dedup_containment_est_eval": (4, 9, 0, 1),
    # day-spine rollup + broadcast day-pair self-join; the median is
    # order-statistic selection via exact_global_rank (range exchange +
    # pid-local rank window + bounded offsets window) — NOT the 1-group
    # exact percentile, whose single-task buffer merge cost 2.3x
    "t34_theil_sen_trend": (4, 4, 2, 0),
    # stage-1 ADC exchange + shortlist window, stage-2 rerank join +
    # window, diagnostic brute leg + window; distance tables broadcast
    "ann_two_stage_rerank": (5, 5, 3, 4),
    # --- round-12 drafts (written round 9) ---
    # BFS state is pinned (localCheckpoint) so the visible tail is the
    # 25-row centrality rollup + broadcast back onto the nation dim
    "g_closeness_centrality": (1, 1, 0, 0),
    # component rollup + centroid assembly + a/b minima + label rollup;
    # K centroid rows broadcast against the vector scan
    "emb_silhouette_eval": (4, 1, 0, 0),
    # (method, fp, split) rollup -> (method, fp) -> method; pair counts
    # are C(n,2) arithmetic, no pair frame
    "split_leakage_safe_groups": (3, 0, 0, 0),
    # one map-combinable day rollup; the HW recursion folds in codegen
    "t36_holt_winters_daily": (1, 0, 0, 0),
    # truth-side shingle join + pair/size rollups; candidate leg rides
    # the production banding; panel filters pushed to the scans
    "dedup_lsh_s_curve_eval": (5, 4, 0, 6),
    # token + distinct-bigram exchanges, two 1-row totals broadcast;
    # final TakeOrdered, no full sort
    "text_kn_continuation_stats": (4, 3, 0, 0),
    # Arrow fingerprint kernel exchange + the full-hash-keyed
    # neighborhood equi-join; non-empty filter pushed
    "mm_wht_fingerprint_pairs": (2, 1, 0, 1),
    # day rollup + lag window over the calendar spine; 1-row moments
    "t37_ar2_yule_walker": (1, 0, 1, 0),
    # truth window + pinned one-pass cell ranking; the level dimension,
    # probe lists, and count digests all ride broadcasts
    "ann_ivf_nprobe_curve": (5, 7, 1, 2),
    # ONE scan: grouped-expand multi-distinct is a single exchange; the
    # 6-row stack needs no second pass
    "diag_table_profiler": (1, 0, 0, 0),
    # BFS state pinned; visible tail = ecc rollup + 1-row extrema bcast
    "g_eccentricity_diameter": (2, 1, 0, 0),
    # one source-keyed map-combinable exchange; pure integer moments
    "sample_ess_lengths": (1, 0, 0, 0),
    # (term,doc) + term-moment exchanges + 1-row N broadcast; TakeOrdered
    "text_term_burstiness_topk": (3, 1, 0, 0),
    # edge derivation + degree rollup; degrees join back as broadcasts
    "g_degree_assortativity": (3, 5, 0, 4),
    # panel broadcast + per-query top-k window + k-occurrence rollup
    "ann_hubness_stats": (2, 1, 1, 2),
    # (day,dow) fact rollup + 7-row group rollup + 1-row reduce
    "a_anova_weekday_revenue": (2, 0, 0, 0),
    # truth shingle join + signature joins; size/panel digests broadcast
    "dedup_minhash_estimate_eval": (4, 5, 0, 6),
    # kernel exchange + broadcast panel self-join; <=17-row histogram
    "mm_wht_hamming_histogram": (2, 1, 0, 1),
}


@pytest.fixture(scope="module")
def static_plans(spark):
    """Executed-plan strings with AQE off (same rationale as
    test_plan_shapes.static_plans: AQE defers stage insertion and would
    hide the static exchange structure being pinned)."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield {
            name: DRAFTS[name][0](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            for name in _SHAPES
        }
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


@pytest.mark.parametrize("name", sorted(_SHAPES))
def test_draft_plan_shape(static_plans, name):
    max_shuffles, min_broadcasts, max_windows, min_pushed = _SHAPES[name]
    a = audit(static_plans[name])
    assert a["shuffles"] <= max_shuffles, f"{name}: {a['shuffles']} shuffles > {max_shuffles}"
    assert a["broadcasts"] >= min_broadcasts, (
        f"{name}: {a['broadcasts']} broadcasts < {min_broadcasts} — a small side "
        "probably lost its broadcast"
    )
    assert a["windows"] <= max_windows, f"{name}: {a['windows']} windows > {max_windows}"
    assert a["pushed"] >= min_pushed, (
        f"{name}: {a['pushed']} pushed-filter scans < {min_pushed} — a predicate "
        "stopped reaching the parquet reader"
    )


def test_acf_is_single_pipeline(static_plans):
    """The stack() unpivot must keep ACF one scan→agg→window pipeline —
    the per-lag-union regression re-planned it seven times (measured
    14 scans / 21 exchanges before the rewrite)."""
    plan = static_plans["t19_acf_daily_orders"]
    assert plan.count("FileScan") <= 2
    assert audit(plan)["windows"] == 1
