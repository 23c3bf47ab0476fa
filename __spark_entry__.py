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
# evidence first. Round-10 order: the round's touched queries lead (the
# newly certified simhash_bucket_capped, the PIT oracle-form split, the
# margin dial hardening), then every other query ascending by the round of
# its last green driver CORRECTNESS row — recomputed from
# CORRECTNESS_r01–r09 at round-10 start (36 r2-stale queries lead; a
# 50-query driver sample clears every query older than r3), stable within
# each freshness group.
# ---------------------------------------------------------------------------
_PRIORITY: list[str] = [
    # Touched by round-10 product edits (simhash_bucket_capped is the
    # newly oracle-certified production config — zero prior driver
    # evidence; point_in_time_price's default oracle is again the
    # definitional interval join; margin_bitext_mine's dial clamps
    # were hardened)
    "simhash_bucket_capped",
    "point_in_time_price",
    "margin_bitext_mine",
    # Last driver-green in round 2
    "case_scoring",
    "curation_pipeline",
    "customer_hierarchy_depth",
    "date_functions",
    "dedup_latest",
    "doc_length_histogram",
    "dq_curation_suite",
    "dq_orders_suite",
    "embedding_centroids",
    "embedding_dup_clusters",
    "embedding_near_dups",
    "first_value_repr",
    "group_size_window",
    "json_build_roundtrip",
    "json_extraction",
    "lag_growth",
    "language_capped_sample",
    "mart_customer_health",
    "mart_product_period_spending",
    "mart_segment_summary",
    "nested_child_table",
    "null_blank_cleaning",
    "order_cadence",
    "percent_rank_customers",
    "pii_redaction",
    "price_grid_clustering",
    "priority_dedup",
    "regex_functions",
    "running_max",
    "sequence_packing",
    "sql_nation_revenue",
    "string_functions",
    "surrogate_keys",
    "top_terms_per_doc",
    "union_distinct_values",
    "variant_payload_extract",
    # Last driver-green in round 3
    "asof_next_purchase",
    "audio_wav_features",
    "bloom_promo_attribution",
    "cluster_balanced_sample",
    "cohort_retention_matrix",
    "company_consolidation",
    "company_representatives",
    "country_normalization",
    "cumulative_distinct_types",
    "customer_retention_setops",
    "daily_revenue_anomalies",
    "domain_mixture_sample",
    "email_domain_stats",
    "image_ppm_features",
    "lineitem_stats_by_flag",
    "metric_layer_summary",
    "order_options_kv",
    "order_value_outliers",
    "orders_fact",
    "percent_parse",
    "pivot_revenue",
    "pricing_summary",
    "priority_counts_json",
    "region_revenue",
    "revenue_share",
    "rolling_median_value",
    "sessionization",
    "sliding_window_counts",
    "string_agg_sorted",
    "top_customers",
    "tpch_q10_returned_items",
    "tpch_q3_shipping_priority",
    "training_order_manifest",
    "union_projection_alignment",
    "user_activity_streaks",
    "user_funnel_stages",
    # Last driver-green in round 4
    "cube_status_priority",
    "customer_profile",
    "customer_spend_quartiles",
    "daily_revenue_spine",
    "events_locf",
    "inventory_deltas",
    "key_skew_profile",
    "rolling_range_window",
    "session_window_native",
    "tpch_q14_promo_effect",
    "tpch_q18_large_volume_customers",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tumbling_window_counts",
    "user_event_gaps",
    "user_event_gaps_streamed",
    # Last driver-green in round 5
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_types",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q1_pricing_summary_sql",
    "tpch_q20_dominant_suppliers",
    "tpch_q21_suppliers_kept_waiting",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    # Last driver-green in round 8
    "basket_pair_lift",
    "bigram_backoff_scores",
    "bm25_topk",
    "ccnet_perplexity_buckets",
    "chunk_overlap_pairs",
    "chunk_overlap_pairs_incremental",
    "copurchase_pagerank",
    "copurchase_triangles",
    "dedup_keep_best",
    "discount_allocation",
    "dsir_importance_weights",
    "embedding_near_dups_incremental",
    "event_transition_matrix",
    "events_interpolate",
    "exact_substring_removal",
    "exact_substring_removal_incremental",
    "exact_substring_spans",
    "exact_substring_spans_incremental",
    "gopher_quality_rules",
    "hard_negative_pairs",
    "hybrid_rrf_topk",
    "incremental_join_view",
    "lang_id_class_f1",
    "lang_id_kappa",
    "lang_id_ngram_nb",
    "lang_quality_deciles",
    "leakage_safe_split",
    "nb_confidence_calibration",
    "nb_source_classifier",
    "near_dup_clusters_star",
    "ngram_jaccard_pairs",
    "order_volume_trend_ols",
    "pareto_skyline_parts",
    "pmi_collocations",
    "quality_auc_by_source",
    "region_spend_rank",
    "retrieval_arm_ndcg",
    "rfm_segments",
    "segment_dedup_removal",
    "segment_dedup_removal_incremental",
    "semantic_dedup_cells",
    "source_kl_drift",
    "supplier_inflight_peak",
    "time_weighted_value",
    "txn_skipped_revenue",
    "unigram_logprob_scores",
    "unimax_language_budget",
    "weighted_sample_es",
    # Last driver-green in round 9
    "ar_aging",
    "asof_last_view",
    "benchmark_contamination",
    "bloom_pruned_revenue",
    "cross_join_scalar",
    "customers_without_orders",
    "doc_chunks",
    "doc_fingerprints",
    "doc_quality_scores",
    "doc_repetition",
    "doc_winnowing_fingerprints",
    "docs_exact_dedup",
    "embedding_ann_lsh",
    "embedding_cosine_topk",
    "embedding_ivf_topk",
    "embedding_quantized_topk",
    "explode_ordinality",
    "frequent_tokens",
    "having_duplicates",
    "lang_id",
    "marketing_attribution",
    "minhash_signatures",
    "modality_alignment",
    "mode_deterministic",
    "multi_alias_join",
    "multi_grain_union",
    "multimodal_features",
    "multimodal_frame_sample",
    "near_dup_clusters",
    "near_dup_pairs",
    "near_dup_pairs_incremental",
    "order_reconciliation",
    "order_value_percentiles",
    "part_name_fuzzy_matches",
    "parts_with_returns",
    "product_pricing_history",
    "promo_period_revenue",
    "rollup_revenue",
    "salted_segment_revenue",
    "signup_attribution",
    "simhash_fingerprints",
    "simhash_near_dups",
    "stratified_sample",
    "text_token_stats",
    "tfidf_weights",
    "trailing_period_metrics",
    "unpivot_balances",
    "weighted_discount_ratio",
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
