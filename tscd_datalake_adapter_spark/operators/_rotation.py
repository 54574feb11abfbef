"""Registry rotation: driver-verified query names, by round.

The round driver's CORRECTNESS check truncates the registry at its first 50
entries (verified against CORRECTNESS_r01.json: its keys equal the registry's
first 50 names in order).  With >50 registered queries, registration order
decides which get a hard oracle row each round.  ``load_all`` therefore
reorders the registry so queries that have NEVER had a green driver row come
first; already-verified queries (still guarded every round by pytest's
``tests/test_oracle_parity.py`` over the same oracles) rotate to the back.

Append one entry per round: the names whose CORRECTNESS_r{N}.json row was
fully green (rows/schema/hash all true).  Errored or unchecked names are NOT
listed, so they stay in the front window until they earn a green row.
"""

from __future__ import annotations

# Green rows in CORRECTNESS_r01.json (49 of the 50 checked;
# media_feature_extract errored and so stays in the unverified front set).
_R1_GREEN = [
    "asof_join_purchase_view",
    "dedup_exact",
    "jaccard_near_dup",
    "minhash_lsh_near_dup",
    "simhash_fingerprints",
    "dedup_clusters",
    "simhash_near_dup",
    "ngram_jaccard_near_dup",
    "multimodal_metadata",
    "png_header_parse",
    "text_stats",
    "term_frequencies",
    "quality_scores",
    "token_count_regex",
    "language_id",
    "tfidf_top_terms",
    "doc_fingerprints",
    "corpus_curation",
    "unpivot_lineitem_metrics",
    "pricing_summary",
    "global_agg",
    "count_distinct_by_status",
    "rollup_counts",
    "cube_counts",
    "distinct_segments",
    "stats_by_returnflag",
    "collect_sorted_segments",
    "revenue_by_segment",
    "local_supplier_volume",
    "customer_order_histogram",
    "semi_join_customers",
    "anti_join_customers",
    "theta_join_part_pairs",
    "cross_join_region_status",
    "customers_per_region",
    "full_outer_nation_counts",
    "shipping_priority",
    "revenue_forecast",
    "returned_items",
    "window_rank_orders",
    "window_lag_orders",
    "window_running_sum",
    "window_ntile_customers",
    "window_range_frame",
    "topk_orders_global",
    "exists_probe",
    "list_distinct_custkeys",
    "sort_multi_key_nulls",
    "union_all_overlap",
]

VERIFIED_BY_ROUND: dict[int, list[str]] = {1: _R1_GREEN}

VERIFIED: frozenset[str] = frozenset(
    name for names in VERIFIED_BY_ROUND.values() for name in names
)


def rotate(registry: dict) -> dict:
    """Unverified queries first (registration order), verified ones last."""
    front = {n: s for n, s in registry.items() if n not in VERIFIED}
    back = {n: s for n, s in registry.items() if n in VERIFIED}
    return {**front, **back}
