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

# name -> (max shuffles, min broadcasts, max windows, min pushed-filter scans)
# Shuffle/window counts are CEILINGS (fewer is fine); broadcasts and
# pushed-filter scans are FLOORS (a lost broadcast or a filter that stops
# reaching the parquet reader is exactly the regression being guarded).
# Covers the ENTIRE bench headline set (tools/plan_report.HEADLINE).
_SHAPES = {
    "j1_multiway_revenue": (1, 3, 0, 4),
    "j5_copurchase_pairs": (3, 0, 0, 0),
    # j5/j6: 3rd exchange is the salted hot-hub branch's repartition —
    # empty at runtime below J5_LARGE_BASKET, pruned by AQE
    "j6_two_hop_supplier_pairs": (3, 0, 0, 0),
    "a8_distinct_parts_per_customer": (2, 1, 0, 2),
    "a14_customer_summary_rebuild": (1, 2, 0, 3),
    "w3_running_avg_per_customer": (1, 0, 1, 0),
    "t7_hourly_tumbling_window": (1, 0, 0, 1),
    "j9_date_spine_join": (1, 1, 0, 0),
    "g_pagerank_nations": (5, 15, 0, 5),
    "a_funnel_signup_view_purchase": (4, 3, 0, 5),
    "t8_sessionization": (1, 0, 2, 0),
    "j11_asof_join_last_view": (1, 0, 1, 2),
    "j12_range_join_bucketed": (1, 1, 0, 2),
    # r14 pin-once (guide §1.2): the band frame / shingle sets are
    # localCheckpointed before their self-joins, so the tokenize+signature
    # subtree runs once — the parquet scans (and their pushed filters) live
    # inside the pin job, not the visible plan (pushed floor drops to 0)
    "dedup_minhash_lsh_candidates": (0, 1, 0, 0),
    "dedup_ngram_jaccard_pairs": (1, 3, 0, 0),
    "ann_topk_cosine": (1, 1, 1, 2),
    "ann_ivf_topk": (1, 1, 1, 0),
    # r8 clone collapse: gkey member-rank window (reps + first-4), rep×rep
    # bucket join, per-group top-4 window, per-query top-3 window — the
    # naive quadratic-in-clones self-join (x26.86 at 20x replication) is
    # gone (x0.81 after); +0.4s on a clone-free corpus is the price
    # r13 block-matmul: rep-vectors exchange ONCE on bucket into the
    # applyInPandas BLAS kernel (O(members) through Arrow, not O(pairs)
    # interpreted HOF dots — 2.9s pair subtree -> matmul); the former
    # broadcast pair join becomes the bucket exchange + expansion joins
    "ann_lsh_bucket_topk": (5, 2, 4, 0),
    "text_quality_scores": (0, 0, 0, 0),
    "text_tfidf_top_terms": (4, 1, 2, 0),  # +1: spread()
    "text_chunk_sliding": (0, 0, 0, 0),
    "emb_kmeans_assign_stats": (1, 0, 0, 0),
    "dedup_cross_split_contamination": (3, 1, 0, 0),
    "j13_local_supplier_volume": (1, 5, 0, 6),
    # r10 promotions (VERDICT r9 #7): pins mirror the audited shapes at
    # promotion time (test_draft_plan_shapes carried j21/profiler earlier)
    "a_approx_distinct_check": (2, 0, 0, 0),
    # r13: one union leg per column (single-column scans), each leg a
    # distinct-collapse + 1-row rollup joined by broadcast-nested-loop —
    # 6 distinct-value exchanges replace the Expand-based 6-way mixed
    # multi-distinct whose interpreted aggregation cost ~5x (3.2s->0.5s)
    "diag_table_profiler": (6, 6, 0, 0),
    # r13 basket shape: ONE order-keyed collect_set exchange + in-task
    # pair expansion replaces the distinct + self-join (4 fact-distinct
    # subtree evaluations -> 1); the pushed-filter floor drops to 0
    # because the old plan's pushed isnotnull came from the self-join
    # keys — the basket aggregate needs no scan predicate. r14: the
    # direction flip explodes a 2-struct array instead of unioning two
    # projections, so the frequent-pair frame (and its two item-support
    # broadcast joins) plans once — broadcast floor 5 -> 3 (isup x2 + n)
    "j21_association_rules": (4, 3, 0, 0),
    "g_bfs_recursive_native": (1, 0, 0, 0),
    # r13 heavyweight promotions (audited at promotion time)
    # r13 metric assembly: one flagged full_outer join + single aggregate
    # replaces three aggregates + a hit join — the truth/candidate
    # subtrees (whose panel dims were 5 of the 9 broadcasts) run once
    # r14: candidate band frame AND truth shingle sets pinned once — two
    # fewer shuffles; all scans (and their pushed filters) move inside
    # the pin jobs, so the visible plan reads checkpoints only
    "dedup_minhash_highrecall_pr_eval": (2, 4, 0, 0),
    "emb_anisotropy_stats": (0, 0, 0, 0),
    # r14: fingerprint frame pinned once (fed the chunk self-join AND both
    # hamming-verify joins — 4 evaluations of the 32-bit-sum aggregate)
    "dedup_simhash_banded_pairs": (0, 3, 0, 0),
    # r12 knob-proof registrations: pagerank's 3 iterations are 3 dst
    # exchanges over the pinned edge RDD (node-sized ranks broadcast);
    # adaptive multi-probe is one bucket-join shuffle + broadcast panel;
    # power iteration is ONE d-wide exchange + broadcast normalizer
    "g_pagerank_damped": (3, 10, 0, 3),
    "ann_srp_adaptive_topk": (1, 3, 1, 4),
    "emb_power_iteration_v2": (1, 1, 0, 0),
    # late-r12 knob-proof promotions: bm25's 4 exchanges are the tf/df/
    # doclen rollups + final top-k (term panel broadcast); PSI is one
    # grouped-expand exchange + two broadcast cut-line/ref sides; the
    # 4-stage funnel is one groupBy(user) exchange per stage over
    # type-pruned scans (6 pushed filters = 4 stage scans + 2 chained
    # first-touch joins), stage joins broadcast the per-user min-ts side
    "text_bm25_tuned": (4, 3, 0, 2),
    "diag_psi_quartile_drift": (1, 2, 0, 1),
    "a_funnel_reengagement": (4, 5, 0, 6),
    "j14_unshipped_value_topk": (1, 1, 0, 2),
    "g_triangle_support": (1, 2, 0, 0),
    "a_sketch_rollup_regions": (3, 2, 0, 3),
    "mm_frame_sample": (0, 0, 0, 0),
    "j15_asof_next_purchase": (1, 0, 1, 2),
    "text_pack_bins": (1, 0, 1, 0),
    "q1_pricing_summary": (1, 0, 0, 1),
    "w7_activity_islands": (1, 0, 1, 0),
    "text_token_stats": (1, 0, 0, 0),  # +1: spread() rebalance of the 1-row-group scan
    "text_dup_shingle_coverage": (4, 0, 1, 0),  # +1: spread()
    "sample_temperature_mix": (2, 1, 0, 0),
    "scd2_state_intervals": (1, 0, 3, 0),
    # j16: every exchange is dimension-sized (bitmap words / supplier keys);
    # the fact scan reaches the prefilter and verify join broadcast-only.
    # r14: the exact verify join broadcasts the key set too (was a
    # sort-merge LeftSemi shuffling every Bloom survivor — the exact
    # shuffle the prefilter exists to avoid); shuffles 4 -> 3, +2
    # broadcasts (verify keys + their build-side dims)
    "j16_bloom_semi_filter": (3, 6, 0, 5),
    "text_unigram_logprob": (3, 1, 0, 0),
    # r13: encode+decode kernels fused into ONE mapInPandas (no hash
    # exchange at all — spread() is round-robin, not counted)
    "mm_png_decode_roundtrip": (0, 0, 0, 0),
    "sample_token_budget_fill": (1, 0, 1, 0),
    # single-pass funnel: fp-window + source-window exchanges only
    "pipeline_corpus_curation": (2, 0, 2, 0),
    "emb_power_iteration_step": (2, 1, 0, 0),
    # panel-bounded eval: truth window + small hit/size rollups; the panel
    # and bucket sides ride broadcasts
    "ann_recall_eval": (5, 4, 1, 5),
    # FastSS blocking, basket-shaped: ONE variant-key exchange into member
    # baskets (reused by both expansion branches), verified-pair distinct
    # (reused by both union arms), rollup — no join, so no broadcast and
    # no join-induced pushed filters
    "dedup_fuzzy_name_pairs": (3, 0, 0, 0),
    # +1 each: spread() rebalance of the 1-row-group documents scan
    "text_bpe_pair_counts": (2, 0, 0, 0),
    "dedup_span_first_occurrence": (3, 0, 1, 0),
    "sample_domain_cap": (1, 0, 1, 0),
    # bounded eval slice rides a broadcast; vec_id bound reaches both scans
    "emb_matryoshka_fidelity": (1, 1, 0, 2),
    # one map-side-combinable aggregate; only round-robin/single-partition
    # exchanges (not counted), features stay in codegen
    "ml_logreg_grad_step": (0, 0, 0, 0),
    # (source, word) collapse + per-source rollup; trainer collect is the
    # bounded vocab pull, segmenter UDF input is vocab-sized
    "text_bpe_one_merge_compression": (2, 0, 0, 0),
    # per-row codec kernels, no shuffle at all; scan prunes to doc_id
    "mm_wav_decode_features": (0, 0, 0, 0),
    # sketch path is 2 exchanges; the rest is the exact-audit join (distinct
    # subtree appears in three branches), all small sides broadcast
    "a_sketch_vocab_overlap": (6, 3, 0, 1),
    # decorrelated Q17: per-part agg + same-key join back (one lineitem
    # exchange reused), part dim broadcast
    "j17_small_quantity_revenue": (2, 1, 0, 3),
    # final assignment pass of the trained model (iterations run inside
    # kmeans_train; each is the same 1-exchange shape)
    "emb_kmeans_train_stats": (1, 0, 0, 0),
    # native session_window: one user_id exchange + in-aggregate gap merge
    "t9_session_window_native": (1, 0, 0, 1),
    # Q21 shape: semi+anti decorrelated to joins (broadcast at guard scale,
    # orderkey hash joins at size); returnflag filters reach all scans
    "j18_sole_blame_supplier": (1, 1, 0, 4),
    # (source, token) collapse, totals join back on source, entropy rollup
    "text_entropy_by_source": (4, 1, 0, 1),
    # asof union+window on user_id, then a single-group percentile over
    # conversion-sized input; event_type filters reach both scans
    "a_conversion_lag_quantiles": (1, 0, 1, 2),
    # panel-bounded eval mirroring ann_recall_eval for the IVF index:
    # centroids/panel/rollups ride broadcasts, truth window + small aggs
    "ann_ivf_recall_eval": (5, 4, 1, 2),
    # --- round-6 headline promotions (former draft layer) ---
    # peel rounds are eagerly checkpoint-pinned (an unpinned loop
    # triples the subtree per round: ~500 FileScans, 13s at sf0.1), so
    # the FINAL plan is one degree aggregate over the pinned edge set
    "g_kcore_parts": (1, 0, 0, 0),
    # the edge set is eagerly checkpoint-pinned (unpinned, each of its
    # four consumers re-plans the 4-way fact join: 64 FileScans); the
    # final plan is node-scale wedge/degree/anti joins only
    "g_adamic_adar_nations": (6, 0, 0, 0),
    # tf + df collapses; idf/len dims broadcast onto the scoring join;
    # top-k is TakeOrdered
    "text_bm25_topk": (4, 3, 0, 2),
    # BM25 arm + title arm fused post-limit: the rank windows run over
    # RRF_DEPTH-bounded frames only
    "text_rrf_hybrid_topk": (4, 4, 2, 3),
    # exact-clone groups collapse BEFORE the prefix join (duplicate-robust
    # PPJoin: the similarity join sees distinct token sets only, member
    # pairs expand back afterwards) — +group/expansion exchanges, all
    # group- or answer-sized, in exchange for removing the k²-per-token
    # straggler a duplicated corpus creates
    # r8: the tokenize/clone-group/sorted-set subtrees are eagerly pinned
    # (localCheckpoint) — the visible plan is only the candidate join +
    # verify + expansions downstream of the pins (was 20 FileScans / 25
    # exchanges re-evaluating the scan subtree; now 1 scan inside the pin)
    # r14: tokens ride as vocab-rank longs (freq table bijection) and the
    # verified-candidate frame is pinned too (the optimizer had re-inlined
    # array_intersect into the join condition — 3 evaluations/candidate);
    # the candidate join + verify now run inside pin jobs, leaving only
    # the member expansions + TakeOrdered in the visible plan
    "dedup_prefix_filter_jaccard": (0, 3, 0, 0),
    # skyline via day-collapse + day-spine suffix-max + broadcast join —
    # the pin that keeps the x35-at-20x two-phase row-window form out
    "o7_pareto_front_orders": (1, 1, 1, 0),
    # kernel fingerprints, band-keyed candidate join, hamming verify.
    # r13: fingerprint frame pinned (kernel evaluated once, not once per
    # join side), so the visible plan starts at a checkpointed RDD — the
    # pushed-filter scan lives inside the pin now (floor 0), and the
    # redundant spread()+repartition double exchange is gone
    "mm_ahash_near_dup_pairs": (1, 1, 0, 0),
    # multi-stage curation funnel: quality/langid/dedup/pack stages each
    # keyed on their own column, every small side broadcast. r13: the
    # raw/target DSIR histograms collapse to ONE conditional-count
    # groupBy (8 exchanges, the bucket re-join and its broadcast gone).
    # r14: the funnel rides ONE flagged frame + one rollup (tokenize 3x
    # -> 1x on the base side) and the DSIR totals ride a whole-frame
    # window over the bucket-constant hist instead of re-planning the
    # corpus explode inside a broadcast — shuffles 8 -> 4, broadcasts
    # 4 -> 2, windows stay 2 (fp dedup + bucket totals)
    "pipeline_curation_v2": (4, 2, 2, 1),
    # codebook broadcast onto the ADC scan; per-query top-k window.
    # r13: code assignment is ONE Arrow mapInPandas (numpy matmul per
    # subspace) — the m·(K+1) interpreted HOF-dot projection and its
    # pushed isnotnull(embedding) scan predicate live inside the opaque
    # kernel's select now (pushed floor 2 -> 1)
    "ann_pq_adc_topk": (2, 1, 1, 1),
    # candidate/truth panels and per-band dims ride broadcasts;
    # precision/recall rollups are key-sized. r13 metric assembly: one
    # flagged full_outer join + single aggregate — each subtree runs
    # once, dropping the duplicated panel broadcasts (9 -> 4)
    # r14: + band-frame and truth-shingle pin-once (2 fewer shuffles;
    # all scans move inside the pin jobs)
    "dedup_minhash_pr_eval": (2, 4, 0, 0),
    # --- round-8 headline promotions ---
    # 3 greedy rounds: token-set joins against 1-doc broadcasts only —
    # never a pool×pool similarity join
    # r8: pool/token-set/round-1 state pinned (localCheckpoint) — visible
    # plan is round 2+3 only (was 69 FileScans re-tokenizing per round)
    # mmr: since the phase-5 retrieval library (r12), every greedy round is
    # pinned (localCheckpoint inside mmr_select), so the VISIBLE suffix is a
    # union of projections over ExistingRDD scans — the per-round broadcast
    # semi-joins run inside the eager pin jobs and are audited by the
    # library's own plan assertions, not this executed-plan string
    "text_mmr_diverse_topk": (0, 0, 0, 0),
    # fact join is inside the eager edge pin; score frames broadcast into
    # the edge joins. r14: hub1 (3 consumers) and the full-outer score
    # frame (2: totals + final select) are pinned, so each HITS round's
    # edge join+agg runs ONCE — the visible plan is the totals broadcast
    # over the score checkpoint (was 10 exchanges / 8 broadcasts of
    # re-planned round subtrees)
    "g_hits_two_rounds": (0, 1, 0, 0),
    # r13: ONE custkey collect_set agg yields d1 AND d2 (was two fact
    # aggs + join), and the calendar-bounded by_t frame is pinned — the
    # visible plan is the spine windows over the checkpoint (n_total
    # derived from by_t, broadcast); fact exchanges run inside the pin
    "a_survival_hazard_curve": (0, 1, 2, 0),
    # r13: intervals explode into both delta rows in-task (union of two
    # subtree evaluations gone) and the calendar-bounded by_day frame is
    # pinned — visible plan is the prefix window + bounds broadcast over
    # the checkpoint; the interval join/aggregate runs inside the pin
    "a_open_orders_per_day": (0, 1, 1, 0),
    # rounds are checkpoint-pinned (labels broadcast inside each round);
    # the final plan is one node-keyed rollup over the pinned labels
    "g_label_propagation_communities": (1, 0, 0, 0),
    # --- round-8/9 headline promotions (VERDICT r6 #4) ---
    # custkey + value collapses; boundary filter rides the 1-row total
    # broadcast. r8: exact_prefix_sum pins its ranged frame (correctness —
    # see operators/ranks.py), truncating the visible lineage.
    # r13: BOTH descending running totals come from ONE
    # exact_prefix_sums range pass (was two chained passes = two range
    # exchanges + two pins), and the grand total aggregates the PINNED
    # frame instead of re-evaluating the orders-scan subtree — the
    # second range exchange is gone (4 -> 3 shuffles) and the totals
    # broadcast now hangs off the pin (2 -> 3 broadcasts, 0 visible
    # pushed-filter scans: no fact scan survives outside the pin)
    "a_pareto_8020_concentration": (3, 3, 2, 0),
    # one (source, token) collapse; pair grid + totals ride broadcasts.
    # r14: the collapse is pinned (it fed totals, the source list twice
    # and the grid = 4 corpus tokenize evaluations, 10 scans); pushed
    # floor 1 -> 0 — no fact scan survives outside the pin job
    "text_jsd_source_pairs": (6, 4, 0, 0),
    # edges pinned once; triangle join + degree/corner rollups are all
    # edge-scale exchanges (deliberately NOT broadcast: edge lists are
    # fact-derived and unbounded on real graphs)
    "g_clustering_coefficient": (11, 0, 0, 0),
    # pushed quarter scan; EXISTS = one semi join; 5-row rollup
    "j23_late_orders_q4": (1, 1, 0, 2),
    # --- round-10 headline promotions ---
    # assignment behind the pin; ADC tables + query cells ride broadcasts;
    # one (query, neighbor) exchange; per-query top-k window. r13: Arrow
    # code assignment folds the pushed isnotnull(embedding) of the old
    # HOF-dot encode into the kernel's select (pushed floor 2 -> 1)
    "ann_ivfpq_topk": (1, 3, 1, 1),
    # exact_global_rank (range exchange + 2 bounded windows + offsets
    # broadcast) + ONE rank-keyed neighbor join; no cross join
    # r8: exact_global_rank pins its ranged frame (operators/ranks.py) —
    # both join sides re-read the pinned rank, counted per branch
    # r14: the RANKED frame is pinned too — the r13 plan ran the rank
    # pipeline (pid exchange + sort + local window + offsets window) once
    # per join side x rank subplan = 4x; now one ranking pass feeds both
    # sides (windows 4 -> 0 in the visible plan, shuffles 4 -> 0)
    "dedup_sorted_neighborhood": (0, 1, 0, 0),
    # --- r10-cohort promotions after driver verification (VERDICT r7 #6) ---
    # truth = panel-bounded shared-token join; candidate side is the SNM
    # query (rank exchange + neighbor join). r13 metric assembly: one
    # flagged full_outer join + single aggregate — truth AND candidate
    # subtrees (each formerly evaluated twice, with their panel
    # broadcasts and rank windows) now run once
    # r14: inherits the pinned SNM rank (windows 4 -> 0, shuffles 6 -> 2)
    # + pinned truth token sets (scans inside the pin jobs)
    "dedup_snm_recall_eval": (2, 4, 0, 0),
    # ONE K-way ranking pass yields db assignment AND probe list from the
    # same pinned window; candidates cell-keyed; truth panel-broadcast
    "ann_ivf_nprobe2_recall": (5, 4, 1, 2),
    # one orderkey fact exchange; dims/nations ride broadcasts
    "j31_volume_shipping_q7": (1, 5, 0, 4),
    # region prune through two broadcast dims; one fact exchange; one
    # conditional-sum pass for numerator AND denominator
    "j32_market_share_q8": (1, 6, 0, 7),
    # --- r9 promotions (VERDICT r8 #8): slowest two registry queries ---
    # r9 block-matmul rewrite: member vectors ride two broadcast cell-pair
    # joins into ONE pid exchange feeding the applyInPandas BLAS kernel
    # (O(members), not O(pairs), through Arrow); clusters consume the
    # pinned edge list, so its visible plan starts at checkpointed RDDs
    "dedup_semantic_clusters": (2, 0, 0, 0),
    "dedup_embedding_cosine_pairs": (1, 2, 0, 0),
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


def test_shapes_cover_whole_headline_set():
    from tools.plan_report import HEADLINE

    assert set(_SHAPES) == set(HEADLINE)


@pytest.mark.parametrize("name", sorted(_SHAPES))
def test_plan_shape(static_plans, name):
    max_shuffles, min_broadcasts, max_windows, min_pushed = _SHAPES[name]
    a = audit(static_plans[name])
    assert a["shuffles"] <= max_shuffles, f"{name}: {a['shuffles']} shuffles > {max_shuffles}"
    assert a["broadcasts"] >= min_broadcasts, (
        f"{name}: {a['broadcasts']} broadcasts < {min_broadcasts} — a dimension join "
        "probably lost its broadcast"
    )
    assert a["windows"] <= max_windows, f"{name}: {a['windows']} windows > {max_windows}"
    assert a["pushed"] >= min_pushed, (
        f"{name}: {a['pushed']} pushed-filter scans < {min_pushed} — a predicate "
        "stopped reaching the parquet reader"
    )


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
