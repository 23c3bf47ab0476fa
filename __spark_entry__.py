"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``importer_spark/``; this module only adapts the
registry to the driver's calling convention. The SAMPLING ORDER below is
driver protocol, not engine semantics — it lives here (outside the
cert-hashed product tree) so evidence-freshness reorders never invalidate
gate certificates (r8 verdict #4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from importer_spark.queries import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# Export order = external-verification sampling order. A verifier that draws
# a prefix of the catalog should hit the queries with the LEAST prior driver
# evidence first. Round-9 order: queries whose product code this round
# touched lead (range_attribution guards → signup_attribution; the r8 window
# tiebreak → product_pricing_history; the skew-gate oracle rewrite →
# point_in_time_price; corpus-adaptive planes → margin_bitext_mine; the
# _simhash_pairs SNM plumbing → simhash_near_dups; the fuzzy NULL-filter
# reorder → part_name_fuzzy_matches), then every other query ascending by
# the round of its last green driver CORRECTNESS row (r1 first, r8 last;
# recomputed from CORRECTNESS_r01–r08 at round-9 start, stable within each
# freshness group).
# ---------------------------------------------------------------------------
_PRIORITY: list[str] = [
    # Touched by round-9 product edits
    "signup_attribution",
    "product_pricing_history",
    "point_in_time_price",
    "margin_bitext_mine",
    "simhash_near_dups",
    "part_name_fuzzy_matches",
    # Last driver-green in round 1
    "mode_deterministic",
    "trailing_period_metrics",
    "multi_grain_union",
    "rollup_revenue",
    "having_duplicates",
    "ar_aging",
    "weighted_discount_ratio",
    "marketing_attribution",
    "unpivot_balances",
    "order_reconciliation",
    "multi_alias_join",
    "cross_join_scalar",
    "explode_ordinality",
    "asof_last_view",
    "customers_without_orders",
    "parts_with_returns",
    "order_value_percentiles",
    "salted_segment_revenue",
    "docs_exact_dedup",
    "minhash_signatures",
    "near_dup_pairs",
    "benchmark_contamination",
    "multimodal_features",
    "multimodal_frame_sample",
    "modality_alignment",
    "embedding_cosine_topk",
    "embedding_ann_lsh",
    "embedding_ivf_topk",
    "text_token_stats",
    "lang_id",
    "doc_quality_scores",
    "doc_fingerprints",
    "simhash_fingerprints",
    "doc_repetition",
    # Last driver-green in round 2
    "promo_period_revenue",
    "bloom_pruned_revenue",
    "near_dup_pairs_incremental",
    "embedding_quantized_topk",
    "doc_winnowing_fingerprints",
    "doc_chunks",
    "frequent_tokens",
    "tfidf_weights",
    "near_dup_clusters",
    "stratified_sample",
    "pii_redaction",
    "sequence_packing",
    "top_terms_per_doc",
    "language_capped_sample",
    "doc_length_histogram",
    "curation_pipeline",
    "mart_customer_health",
    "mart_segment_summary",
    "mart_product_period_spending",
    "union_distinct_values",
    "price_grid_clustering",
    "order_cadence",
    "dq_orders_suite",
    "dq_curation_suite",
    "customer_hierarchy_depth",
    "string_functions",
    "regex_functions",
    "surrogate_keys",
    "json_extraction",
    "date_functions",
    "case_scoring",
    "null_blank_cleaning",
    "sql_nation_revenue",
    "json_build_roundtrip",
    "nested_child_table",
    "embedding_centroids",
    "embedding_near_dups",
    "embedding_dup_clusters",
    "variant_payload_extract",
    "dedup_latest",
    "priority_dedup",
    "lag_growth",
    "percent_rank_customers",
    "first_value_repr",
    "group_size_window",
    "running_max",
    # Last driver-green in round 3
    "lineitem_stats_by_flag",
    "order_options_kv",
    "priority_counts_json",
    "revenue_share",
    "audio_wav_features",
    "image_ppm_features",
    "bloom_promo_attribution",
    "domain_mixture_sample",
    "asof_next_purchase",
    "customer_retention_setops",
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_items",
    "order_value_outliers",
    "rolling_median_value",
    "cumulative_distinct_types",
    "user_activity_streaks",
    "sliding_window_counts",
    "cluster_balanced_sample",
    "metric_layer_summary",
    "user_funnel_stages",
    "daily_revenue_anomalies",
    "cohort_retention_matrix",
    "training_order_manifest",
    "company_consolidation",
    "company_representatives",
    "pricing_summary",
    "orders_fact",
    "top_customers",
    "region_revenue",
    "email_domain_stats",
    "country_normalization",
    "percent_parse",
    "union_projection_alignment",
    "sessionization",
    "pivot_revenue",
    "string_agg_sorted",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q14_promo_effect",
    "tpch_q18_large_volume_customers",
    "rolling_range_window",
    "inventory_deltas",
    "session_window_native",
    "tumbling_window_counts",
    "events_locf",
    "user_event_gaps",
    "user_event_gaps_streamed",
    "cube_status_priority",
    "customer_profile",
    "customer_spend_quartiles",
    "daily_revenue_spine",
    "key_skew_profile",
    # Last driver-green in round 4
    "tpch_q1_pricing_summary_sql",
    "tpch_q2_min_cost_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q20_dominant_suppliers",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q4_order_priority",
    "tpch_q12_shipmode_priority",
    "tpch_q16_supplier_part_types",
    "tpch_q19_discounted_revenue",
    "tpch_q22_global_sales_opportunity",
    # Last driver-green in round 5
    "lang_id_ngram_nb",
    "bm25_topk",
    "hybrid_rrf_topk",
    "retrieval_arm_ndcg",
    "pmi_collocations",
    "lang_id_kappa",
    "lang_id_class_f1",
    "quality_auc_by_source",
    "leakage_safe_split",
    "unimax_language_budget",
    "chunk_overlap_pairs",
    "chunk_overlap_pairs_incremental",
    "embedding_near_dups_incremental",
    "segment_dedup_removal",
    "segment_dedup_removal_incremental",
    # Last driver-green in round 8
    "exact_substring_removal",
    "ccnet_perplexity_buckets",
    "dedup_keep_best",
    "nb_confidence_calibration",
    "region_spend_rank",
    "exact_substring_removal_incremental",
    "lang_quality_deciles",
    "txn_skipped_revenue",
    "nb_source_classifier",
    "source_kl_drift",
    "hard_negative_pairs",
    "weighted_sample_es",
    "discount_allocation",
    "events_interpolate",
    "ngram_jaccard_pairs",
    "pareto_skyline_parts",
    "supplier_inflight_peak",
    "order_volume_trend_ols",
    "semantic_dedup_cells",
    "copurchase_triangles",
    "incremental_join_view",
    "bigram_backoff_scores",
    "gopher_quality_rules",
    "copurchase_pagerank",
    "dsir_importance_weights",
    "basket_pair_lift",
    "event_transition_matrix",
    "time_weighted_value",
    "rfm_segments",
    "near_dup_clusters_star",
    "exact_substring_spans",
    "exact_substring_spans_incremental",
    "unigram_logprob_scores",
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
if _missing:  # typo guard — fail at import, not in the driver
    raise RuntimeError(f"priority list names unknown queries: {_missing}")


def _ordered(mapping: dict) -> dict:
    out = {n: mapping[n] for n in _PRIORITY if n in mapping}
    out.update({n: v for n, v in mapping.items() if n not in out})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: order-level fact with channel rules
    (reference int_quickbooks__orders.sql re-expressed Spark-first)."""
    return QUERIES["orders_fact"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLES)
