"""Public query surface. Importing this package registers every query."""

from __future__ import annotations

from .registry import REGISTRY, oracles, queries  # noqa: F401


def all_queries():
    """Import every query module (registration side effect) and return the
    registry."""
    # Import order defines registry order, and downstream correctness
    # tooling samples the registry front-to-back — keep the SURVEY §2
    # relational core (relational, sessions, sketches) first so it is
    # always in the verified window; the LLM-ops/graph tail rotates in
    # behind it.
    from . import (  # noqa: F401
        relational,
        sessions,
        sketches,
        dynamic,
        graphq,
        llmops,
        mmops,
    )
    from . import draft_layer

    draft_layer.register_all()
    _prioritize()
    return REGISTRY


# Fallback only (used when no CORRECTNESS_r*.json files are readable —
# e.g. the package imported outside the repo checkout): queries with a
# green driver CORRECTNESS row in rounds 1-2. The live path derives the
# verified set from the CORRECTNESS files themselves, so it cannot drift
# from the actual driver evidence.
_VERIFIED_EARLIER = frozenset({
    "s1_scan_filter_project", "s3_semi_join_filter", "p4_substring_search",
    "p5_disjunctive_filter", "p6_array_membership", "p7_json_field_predicate",
    "p8_null_safe_filter", "j1_multiway_revenue", "j2_left_join_summary",
    "j4_anti_join", "j5_copurchase_pairs", "j6_two_hop_supplier_pairs",
    "j9_date_spine_join", "p10_dynamic_search", "g_bfs_nation_hops",
    "g_degree_centrality", "g_pagerank_nations", "g_triangle_support",
    "dedup_exact_groups", "dedup_prefix_near_groups",
    "dedup_minhash_lsh_candidates", "dedup_minhash_verified", "dedup_clusters",
    "dedup_ngram_jaccard_pairs", "dedup_simhash_pairs",
    "dedup_embedding_cosine_pairs", "ann_topk_cosine", "ann_ivf_topk",
    "ann_lsh_bucket_histogram", "ann_lsh_bucket_topk", "text_quality_scores",
    "text_langid_heuristic", "text_winnow_fingerprints", "text_tfidf_top_terms",
    "text_top_bigrams", "sample_stratified_hash", "split_train_val_test",
    "sample_weighted_mix", "diag_key_skew_profile", "text_chunk_sliding",
    "text_top_token_repetition", "text_quality_filter_stats",
    "emb_kmeans_assign_stats", "dedup_cross_split_contamination",
    "text_oov_rate", "text_redaction_stats", "dedup_semantic_clusters",
    "emb_quantize_int8_stats", "mm_binary_metadata", "mm_decode_features_stub",
})


def _last_green_rounds() -> tuple[dict[str, int], dict[str, int]] | None:
    """(hash_green, any_green): name -> latest round with that evidence.

    ``hash_green`` counts only hash-matched rows against the DuckDB
    oracle; ``any_green`` additionally counts completed rows-only checks
    (the weaker gate for oracle-less registrations). Reads
    CORRECTNESS_r*.json from the repo root so the verified set is
    generated from the evidence of record instead of hand-maintained.
    Returns None when no files are readable (package used outside the
    repo checkout).
    """
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    found = False
    hash_green: dict[str, int] = {}
    any_green: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        found = True
        rnd = int(m.group(1))
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if bool(row.get("hash_match")):
                hash_green[name] = max(hash_green.get(name, 0), rnd)
                any_green[name] = max(any_green.get(name, 0), rnd)
            elif (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            ):
                any_green[name] = max(any_green.get(name, 0), rnd)
    return (hash_green, any_green) if found else None


def _prioritize() -> None:
    """Stable-reorder REGISTRY for the external verifier's bounded
    front-to-back window: never-driver-verified queries first (registry
    order), then verified ones by evidence staleness (oldest green round
    first), so once everything has one green row the stalest evidence is
    round-robined back into the window and regressions in already-
    verified queries still get re-checked externally.

    Staleness is measured against the STRONGEST evidence the query can
    produce: an oracled query counts only hash-green rounds (so a query
    upgraded from rows-only to oracled re-enters the window immediately —
    its prior rows-only rows are not hash evidence), while an oracle-less
    registration counts its rows-only completions (all the driver can
    record for it; otherwise it would hog the front of the window forever).

    Rotation-honesty reserve: never-verified queries are capped at
    ``_WINDOW - _RESERVE`` per window, so even a large registration influx
    (round 6 registered 69 drafts at once) leaves ``_RESERVE`` slots for
    the stalest already-verified queries — regressions in old greens keep
    getting re-checked externally while the new cohort burns down over
    two rounds instead of one.
    """
    last = _last_green_rounds()
    if last is None:
        hash_green = any_green = {n: 1 for n in _VERIFIED_EARLIER}
    else:
        hash_green, any_green = last
    index = {n: i for i, n in enumerate(REGISTRY)}

    def key(n: str) -> tuple[int, int]:
        evidence = hash_green if REGISTRY[n].oracle is not None else any_green
        return (evidence.get(n, 0), index[n])

    ordered = sorted(REGISTRY, key=key)
    _WINDOW, _RESERVE = 50, 5
    never = [n for n in ordered if key(n)[0] == 0]
    seen = [n for n in ordered if key(n)[0] > 0]
    cap = _WINDOW - _RESERVE
    if len(never) > cap and seen:
        ordered = never[:cap] + seen[:_RESERVE] + never[cap:] + seen[_RESERVE:]
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    for n in ordered:
        REGISTRY[n] = snapshot[n]
