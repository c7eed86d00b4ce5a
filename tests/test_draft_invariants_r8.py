"""Semantic invariants for the round-8 drafts — properties the oracle hash
can't state (mass conservation, monotonicity, convexity, no-false-negative
guarantees), same spirit as test_draft_invariants_r7.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.parity import SF_TEST_DIR
from yelpdatawarehouse_spark.queries.drafts_r8 import (
    BLOOM_K,
    BLOOM_M,
    DRAFTS,
    GRID_MINPTS,
    KNN_PANEL,
    TRIM_FRAC,
    _BLOOM_SEGMENT,
)
from yelpdatawarehouse_spark.sources.tables import table


def _rows(spark, name, sf_dir=SF_TEST_DIR):
    fn, _ = DRAFTS[name]
    return fn(spark, sf_dir).collect()


def test_hits_shares_sum_to_one(spark):
    rows = _rows(spark, "g_hits_two_rounds")
    assert rows
    assert all(r.hub_score >= 0 and r.auth_score >= 0 for r in rows)
    assert abs(sum(r.hub_score for r in rows) - 1.0) < 1e-5
    assert abs(sum(r.auth_score for r in rows) - 1.0) < 1e-5


def test_survival_hazard_monotone(spark):
    rows = sorted(_rows(spark, "a_survival_hazard_curve"), key=lambda r: r.gap_days)
    assert rows
    # cumulative hazard non-decreasing; at-risk non-increasing; every
    # event row has at least as many at risk as events
    for a, b in zip(rows, rows[1:]):
        assert b.cum_hazard >= a.cum_hazard - 1e-9
        assert b.n_at_risk <= a.n_at_risk
    assert all(r.n_at_risk >= r.n_events > 0 for r in rows)


def test_loo_delta_sign_matches_source_mean(spark):
    """Removing a below-average source must RAISE the corpus mean
    (loo_delta > 0) and vice versa — checked against a direct
    per-source mean computed independently."""
    from yelpdatawarehouse_spark.functions import text as T

    rows = {r.source: r for r in _rows(spark, "diag_loo_source_value")}
    d = table(spark, SF_TEST_DIR, "documents")
    means = {
        r.source: r.m
        for r in d.groupBy("source")
        .agg(F.avg(F.size(T.tokens("text"))).alias("m"))
        .collect()
    }
    corpus_mean = next(iter(rows.values())).corpus_mean_tokens
    for src, row in rows.items():
        if row.loo_delta is None:
            continue
        if means[src] < corpus_mean - 0.01:
            assert row.loo_delta > 0, f"{src}: below-avg source must raise mean"
        if means[src] > corpus_mean + 0.01:
            assert row.loo_delta < 0, f"{src}: above-avg source must drag mean"


def test_trimmed_mean_bounds_and_kept_count(spark):
    rows = _rows(spark, "a_trimmed_mean_quantity")
    li = table(spark, SF_TEST_DIR, "lineitem")
    bounds = {
        r.f: (r.lo, r.hi, r.n)
        for r in li.groupBy(F.col("l_returnflag").alias("f"))
        .agg(
            F.min("l_quantity").alias("lo"),
            F.max("l_quantity").alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    for r in rows:
        lo, hi, n = bounds[r.l_returnflag]
        k = math.floor(n * TRIM_FRAC)
        assert r.n_rows == n
        assert r.n_kept == n - 2 * k
        assert lo <= r.trimmed_mean_qty <= hi


def test_bloom_has_no_false_negatives(spark):
    """The Bloom guarantee the FPR eval rides on: probing the MEMBERS
    against their own bitmap answers 'maybe' for every one of them."""
    from yelpdatawarehouse_spark.functions.hashing import seeded

    c = table(spark, SF_TEST_DIR, "customer").select(
        F.col("c_custkey").cast("string").alias("key"), "c_mktsegment"
    )
    members = c.filter(F.col("c_mktsegment") == _BLOOM_SEGMENT).select("key")
    pos = F.explode(
        F.array(*[seeded("key", s) % BLOOM_M for s in range(BLOOM_K)])
    ).alias("pos")
    bits = members.select(pos).distinct()
    hits = (
        members.select("key", pos)
        .join(bits, "pos")
        .groupBy("key")
        .agg(F.count("*").alias("h"))
        .filter(F.col("h") == BLOOM_K)
        .count()
    )
    assert hits == members.count()
    row = _rows(spark, "diag_bloom_fpr_eval")[0]
    assert 0.0 <= row.fpr_measured <= 1.0
    assert row.n_bits_set <= min(BLOOM_M, BLOOM_K * row.n_members)


def test_trigrams_are_well_formed(spark):
    rows = _rows(spark, "t26_event_trigrams_topk")
    assert 0 < len(rows) <= 10
    counts = [r.cnt for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r.trigram.split(">")) == 3 for r in rows)


def test_open_orders_sweep_closes(spark):
    """Mass conservation of the sweep line: every +1 has a matching -1,
    so the final spine day (max end + 1) must show ZERO open orders, and
    the curve never goes negative."""
    rows = sorted(_rows(spark, "a_open_orders_per_day"), key=lambda r: r.day)
    assert rows
    assert all(r.open_orders >= 0 for r in rows)
    assert rows[-1].open_orders == 0


def test_geometric_median_step_is_convex_combination(spark):
    """One Weiszfeld step is a positively-weighted average of the data, so
    every coordinate must stay inside the per-dimension data range."""
    e = table(spark, SF_TEST_DIR, "embeddings").select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )
    rng = {
        r.dim: (r.lo, r.hi)
        for r in e.groupBy("dim")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    }
    for r in _rows(spark, "emb_geometric_median_step"):
        lo, hi = rng[r.dim]
        assert lo - 1e-6 <= r.median_step_coord <= hi + 1e-6
        assert lo - 1e-6 <= r.mean_coord <= hi + 1e-6


def test_density_grid_conserves_mass(spark):
    rows = _rows(spark, "emb_density_grid_cores")
    n = table(spark, SF_TEST_DIR, "embeddings").count()
    assert sum(r.cnt for r in rows) == n
    for r in rows:
        assert r.is_core == (r.cnt >= GRID_MINPTS)
        assert 0 <= r.n_core_adj <= 8


def test_knn_confusion_covers_panel(spark):
    rows = _rows(spark, "ml_knn_label_eval")
    assert sum(r.n for r in rows) == KNN_PANEL


def test_mmr_scores_nonincreasing_and_distinct(spark):
    rows = sorted(_rows(spark, "text_mmr_diverse_topk"), key=lambda r: r.rank)
    assert [r.rank for r in rows] == [1, 2, 3]
    assert len({r.doc_id for r in rows}) == 3
    # greedy MMR: each later pick scored no higher than the one before
    assert rows[0].mmr_score >= rows[1].mmr_score - 1e-9
    assert rows[1].mmr_score >= rows[2].mmr_score - 1e-9


# ---------------------------------------------------------------------------
# batch-2 drafts


def test_changepoint_split_partitions_spine(spark):
    r = _rows(spark, "t29_binary_segmentation_split")
    assert len(r) == 1
    row = r[0]
    assert row.n_days_before >= 1 and row.n_days_after >= 1
    assert row.sse_reduction >= -1e-9  # SSE can only fall when splitting


def test_farthest_point_seeds_are_spread(spark):
    rows = sorted(_rows(spark, "emb_farthest_point_seeds"), key=lambda r: r.seed_rank)
    assert [r.seed_rank for r in rows] == [1, 2, 3]
    assert len({r.vec_id for r in rows}) == 3
    # seed 3 maximizes the MIN distance to seeds 1-2, which cannot exceed
    # seed 2's distance to seed 1 (greedy k-center invariant)
    assert rows[2].score <= rows[1].score + 1e-6


def test_label_propagation_conserves_nodes(spark):
    from yelpdatawarehouse_spark.sources.tables import table

    rows = _rows(spark, "g_label_propagation_communities")
    # community labels are node ids; membership covers every graph node
    n_nodes = sum(r.n_members for r in rows)
    assert n_nodes > 0
    assert all(r.n_members >= 1 for r in rows)
    assert all(r.min_node >= 0 for r in rows)
    # fewer (or equal) communities than nodes — propagation only merges
    assert len(rows) <= n_nodes


def test_simpsons_flag_consistent_with_slopes(spark):
    rows = _rows(spark, "diag_simpsons_slope_flip")
    for r in rows:
        if r.sign_flipped is None:
            continue
        if r.group_slope is not None and r.pooled_slope is not None:
            # the flag is computed on exact numerators; the rounded slopes
            # must not CONTRADICT it when both are decisively nonzero
            if abs(r.group_slope) > 1e-3 and abs(r.pooled_slope) > 1e-3:
                assert r.sign_flipped == (
                    (r.group_slope > 0) != (r.pooled_slope > 0)
                )


def test_hhi_bounds(spark):
    rows = _rows(spark, "a_hhi_supplier_concentration")
    assert rows
    for r in rows:
        # 1/n (perfect competition) <= HHI <= 1 (monopoly)
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-9


def test_wav_silence_runs_consistent(spark):
    rows = _rows(spark, "mm_wav_silence_segments")
    assert rows
    for r in rows:
        assert 0 <= r.n_quiet <= r.n_frames
        assert r.n_quiet_runs <= r.n_quiet  # each run holds >=1 frame
        assert r.max_quiet_run <= r.n_quiet
        assert (r.n_quiet == 0) == (r.n_quiet_runs == 0) == (r.max_quiet_run == 0)


# ---------------------------------------------------------------------------
# batch-3 drafts


def test_q4_counts_bounded_by_quarter_orders(spark):
    from pyspark.sql import functions as F2
    from yelpdatawarehouse_spark.queries.drafts_r8 import Q4_END, Q4_START

    rows = _rows(spark, "j23_late_orders_q4")
    o = table(spark, SF_TEST_DIR, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp"))
    )
    per_prio = {
        r.p: r.n
        for r in o.groupBy(F.col("o_orderpriority").alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert 0 < r.order_count <= per_prio[r.o_orderpriority]


def test_mann_whitney_u_range(spark):
    (row,) = _rows(spark, "a_mann_whitney_u")
    # 0 <= U_A <= na*nb, and U is a half-integer multiple
    assert 0.0 <= row.u_a <= row.na * row.nb
    assert abs(row.u_a * 2 - round(row.u_a * 2)) < 1e-6


def test_margin_panel_pair_counts(spark):
    from yelpdatawarehouse_spark.queries.drafts_r8 import MARGIN_PANEL

    (row,) = _rows(spark, "emb_intra_inter_margin")
    n = min(
        MARGIN_PANEL,
        table(spark, SF_TEST_DIR, "embeddings")
        .filter(F.col("vec_id") < MARGIN_PANEL)
        .count(),
    )
    assert row.n_intra_pairs + row.n_inter_pairs == n * (n - 1) // 2
    assert -1.0 <= row.intra_cosine <= 1.0
    assert -1.0 <= row.inter_cosine <= 1.0


def test_jsd_bounds_and_symmetric_pairs(spark):
    import math as m

    rows = _rows(spark, "text_jsd_source_pairs")
    assert rows
    for r in rows:
        assert r.s1 < r.s2  # canonical pair orientation, no duplicates
        assert -1e-9 <= r.jsd_nats <= m.log(2) + 1e-9  # JSD in [0, ln 2]


# ---------------------------------------------------------------------------
# round-9 drafts (same gate home — the r8/r9 cohorts share a round)


def test_rolling_correlation_in_range(spark):
    from yelpdatawarehouse_spark.queries.drafts_r9 import DRAFTS as R9

    rows = R9["t32_rolling_correlation"][0](spark, SF_TEST_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_days <= 7
        if r.roll_corr is not None:
            assert -1.0 - 1e-9 <= r.roll_corr <= 1.0 + 1e-9


def test_clustering_coefficient_bounds(spark):
    from yelpdatawarehouse_spark.queries.drafts_r9 import DRAFTS as R9

    rows = R9["g_clustering_coefficient"][0](spark, SF_TEST_DIR).collect()
    assert rows
    for r in rows:
        assert r.triangles <= r.degree * (r.degree - 1) // 2
        if r.clustering_coef is not None:
            assert 0.0 <= r.clustering_coef <= 1.0
        else:
            assert r.degree < 2


def test_class_weights_average_to_one(spark):
    from yelpdatawarehouse_spark.queries.drafts_r9 import DRAFTS as R9

    rows = R9["sample_class_weights"][0](spark, SF_TEST_DIR).collect()
    total = sum(r.n_vectors for r in rows)
    # corpus-weighted mean of the weights is exactly 1 (reweighting
    # preserves effective epoch size)
    wmean = sum(r.n_vectors * r.class_weight for r in rows) / total
    assert abs(wmean - 1.0) < 1e-4
    assert abs(sum(r.frequency for r in rows) - 1.0) < 1e-4


def test_pareto_concentration_sanity(spark):
    from yelpdatawarehouse_spark.queries.drafts_r9 import DRAFTS as R9

    (row,) = R9["a_pareto_8020_concentration"][0](spark, SF_TEST_DIR).collect()
    # the top set is non-empty, no larger than the population, and (by
    # definition of "top spenders") needs at most 80% of customers to
    # reach 80% of revenue
    assert 1 <= row.n_top_customers <= row.n_customers
    assert row.customer_share <= 0.8 + 1e-9
    assert row.revenue_share_target == 0.8
