"""Generate PLANS.md: physical-plan audit of the bench headline queries.

For each headline query this prints the scan columns (pruning evidence),
pushed filters, and the shuffle/broadcast/window/codegen operator counts —
the numbers that decide 100 TB behavior. Run after changing any query:

    python tools/plan_report.py           # writes PLANS.md at the repo root
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

HEADLINE = [
    "j1_multiway_revenue",
    "j5_copurchase_pairs",
    "j6_two_hop_supplier_pairs",
    "a8_distinct_parts_per_customer",
    "a14_customer_summary_rebuild",
    "w3_running_avg_per_customer",
    "t7_hourly_tumbling_window",
    "j9_date_spine_join",
    "g_pagerank_nations",
    "a_funnel_signup_view_purchase",
    "t8_sessionization",
    "j11_asof_join_last_view",
    "j12_range_join_bucketed",
    "dedup_minhash_lsh_candidates",
    "dedup_ngram_jaccard_pairs",
    "ann_topk_cosine",
    "ann_ivf_topk",
    "ann_lsh_bucket_topk",
    "text_quality_scores",
    "text_tfidf_top_terms",
    "text_chunk_sliding",
    "emb_kmeans_assign_stats",
    "dedup_cross_split_contamination",
    "j13_local_supplier_volume",
    "j14_unshipped_value_topk",
    "g_triangle_support",
    "a_sketch_rollup_regions",
    "mm_frame_sample",
    "j15_asof_next_purchase",
    "text_pack_bins",
    "q1_pricing_summary",
    "w7_activity_islands",
    "text_token_stats",
    "text_dup_shingle_coverage",
    "sample_temperature_mix",
    "scd2_state_intervals",
    "j16_bloom_semi_filter",
    "text_unigram_logprob",
    "mm_png_decode_roundtrip",
    "sample_token_budget_fill",
    "pipeline_corpus_curation",
    "emb_power_iteration_step",
    "ann_recall_eval",
    "dedup_fuzzy_name_pairs",
    "text_bpe_pair_counts",
    "sample_domain_cap",
    "dedup_span_first_occurrence",
    "emb_matryoshka_fidelity",
    "ml_logreg_grad_step",
    "text_bpe_one_merge_compression",
    "mm_wav_decode_features",
    "a_sketch_vocab_overlap",
    "j17_small_quantity_revenue",
    "emb_kmeans_train_stats",
    "t9_session_window_native",
    "j18_sole_blame_supplier",
    "text_entropy_by_source",
    "a_conversion_lag_quantiles",
    "ann_ivf_recall_eval",
    # round-6 registrations: the heaviest of the former draft layer get
    # timing-of-record slots so a plan regression in them fails the bench
    # gate, not just the local pins (VERDICT r5 #3).
    "g_kcore_parts",
    "g_adamic_adar_nations",
    "text_bm25_topk",
    "text_rrf_hybrid_topk",
    "dedup_prefix_filter_jaccard",
    "o7_pareto_front_orders",
    "mm_ahash_near_dup_pairs",
    "pipeline_curation_v2",
    "ann_pq_adc_topk",
    "dedup_minhash_pr_eval",
    # heaviest of the round-8 registrations (same policy)
    "text_mmr_diverse_topk",
    "g_hits_two_rounds",
    "a_survival_hazard_curve",
    "a_open_orders_per_day",
    "g_label_propagation_communities",
    # heaviest of the round-8/9 late registrations (VERDICT r6 #4)
    "a_pareto_8020_concentration",
    "text_jsd_source_pairs",
    "g_clustering_coefficient",
    "j23_late_orders_q4",
    # heaviest of the round-10 registrations (same policy)
    "ann_ivfpq_topk",
    "dedup_sorted_neighborhood",
    # driver-verified r10 cohort promotions (VERDICT r7 #6)
    "dedup_snm_recall_eval",
    "ann_ivf_nprobe2_recall",
    "j31_volume_shipping_q7",
    "j32_market_share_q8",
    # r9 promotions (VERDICT r8 #8): after the r8 cosine-kernel fix these
    # became the two slowest registry queries outside the headline — give
    # them timing-of-record slots so a kernel regression fails the bench
    "dedup_semantic_clusters",
    "dedup_embedding_cosine_pairs",
    # r10 promotions (VERDICT r9 #7): the current full-sweep heavyweights
    # get timing-of-record slots so the headline keeps tracking the
    # genuinely heaviest registry paths
    "a_approx_distinct_check",
    "diag_table_profiler",
    "j21_association_rules",
    "g_bfs_recursive_native",
    # heaviest of the round-13 registrations (same policy), plus the
    # library's flagship unbounded-simhash scale path
    "dedup_minhash_highrecall_pr_eval",
    "emb_anisotropy_stats",
    "dedup_simhash_banded_pairs",
    # round-12 knob-proof registrations (graphalgs/embeddings libraries +
    # the query-adaptive multi-probe) — timing-of-record slots so the
    # library paths keep a bench signal
    "g_pagerank_damped",
    "ann_srp_adaptive_topk",
    "emb_power_iteration_v2",
    # late-r12 knob-proofs (retrieval/stats/sessionops libraries)
    "text_bm25_tuned",
    "diag_psi_quartile_drift",
    "a_funnel_reengagement",
]


def audit(plan: str) -> dict[str, object]:
    scans = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\].*?ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split("#")[0] for c in m.group(1).split(",") if c]
        scans.append(cols)
    return {
        # count only REAL Exchange operators: a ReusedExchange line repeats
        # the producing exchange's description ("ReusedExchange [...],
        # Exchange hashpartitioning(...)") but costs no second shuffle —
        # exchange reuse is exactly the optimization the audit should credit
        "shuffles": len(
            re.findall(r"^[^A-Za-z]*Exchange hashpartitioning", plan, re.M)
        ),
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
        "sorts": len(re.findall(r"^\s*[+:]?-? ?\*?\(?\d*\)? ?Sort ", plan, re.M)),
        "windows": len(re.findall(r"\bWindow ", plan)),
        # codegen stages appear as `*(n) Operator` prefixes in the plan tree
        "wscg": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "scans": scans,
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
    }


def main() -> None:
    from yelpdatawarehouse_spark.queries import all_queries
    from yelpdatawarehouse_spark.session import get_spark

    registry = all_queries()
    # AQE wraps the tree in AdaptiveSparkPlan and defers codegen-stage
    # insertion until execution; disable it here so the static plan shows
    # the `*(n)` codegen spans (shuffle/broadcast counts are unaffected).
    spark = get_spark(
        app_name="plan-report", cpus=8, **{"spark.sql.adaptive.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLANS — physical-plan audit of the bench headline set",
        "",
        "Auto-generated by `tools/plan_report.py` (sf-independent plan shapes,",
        f"derived at `{SF_DIR}`). These are the counts that decide scale",
        "behavior: every hash shuffle is a cluster-wide exchange, broadcasts",
        "must stay dimension-sized, scans should read only the projected",
        "columns, and filters should reach the parquet reader.",
        "",
        "| query | shuffles | broadcasts | windows | codegen spans | scan cols (per scan) | pushed-filter scans |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in HEADLINE:
        df = registry[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit(plan)
        scan_desc = "; ".join(str(len(c)) for c in a["scans"]) or "materialized"
        lines.append(
            f"| {name} | {a['shuffles']} | {a['broadcasts']} | {a['windows']} "
            f"| {a['wscg']} | {scan_desc} | {a['pushed']} |"
        )
    lines += [
        "",
        "Notes:",
        "- `scan cols` lists the column count of each parquet scan — compare",
        "  with the table widths (lineitem 11, orders 6, events 6, documents 5,",
        "  embeddings 3) to see pruning.",
        "- `materialized` = the query pins a pre-computed index with",
        "  localCheckpoint (ann_lsh_bucket_topk) so no file scan appears in",
        "  the final plan.",
        "- Window counts include both passes of shared-exchange window pairs",
        "  (t8: lag + running sum reuse ONE shuffle).",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
