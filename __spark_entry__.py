"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``nibbledb_spark.queries`` — the declared query
registry pairing each Spark DataFrame builder with its DuckDB oracle
SQL (SURVEY.md §2 inventory).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from nibbledb_spark.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver's correctness harness evaluates queries in registry order and
# has a fixed per-round budget (it ran exactly the first 50 in rounds 1-3).
# Rotate: names NOT yet hash-verified go first (so the cross-round union
# covers the whole registry), already-verified names follow as regression
# sentinels ordered by STALENESS — the name whose most recent hash-match
# is oldest sorts first, so the 50-slot budget round-robins through the
# whole verified set every ceil(registry/50) rounds and a regression
# (latest record not hash-matched) rejoins the unverified front — and
# rows-only APPROX entries — registry names
# with no declared oracle — sort structurally LAST: they can never
# hash-match, so every driver slot they occupy is budget burned logging
# `no_oracle`. This list is GENERATED — refresh each round:
#   python tools/update_rotation.py CORRECTNESS_r*.json
_DRIVER_VERIFIED = [
    "temperature_mix_rates",
    "temperature_mix_selected",
    "linear_quality_score",
    "linear_quality_score_weighted",
    "pq_ann_topk",
    "recursive_month_ladder",
    "restore_rollback_versions",
    "dv_delete_versions",
    "ts_gaps",
    "retention_weekly_cohorts",
    "window_rank_distribution",
    "insert_feed_versions",
    "ts_anomaly_zscore",
    "lm_quality_bigram",
    "ts_seasonal_residuals",
    "join_lineitem_orders_smj",
    "join_lineitem_part_broadcast",
    "join_salted_orders_customer",
    "join_theta_nation_region",
    "join_outer_order_histogram",
    "join_full_outer_key_coverage",
    "join_semi_customers_with_orders",
    "range_join_shipped_90d",
    "asof_last_purchase_before_click",
    "asof_next_purchase_after_click",
    "rollup_customers_region_nation",
    "cube_orders_status_priority",
    "grouping_sets_revenue",
    "count_distinct_customers",
    "moving_avg_7d",
    "setop_intersect",
    "setop_except",
    "string_funcs_part",
    "math_funcs_lineitem",
    "text_lang_id",
    "text_fingerprints",
    "winnow_near_dup_pairs",
    "dedup_exact",
    "dedup_content",
    "lsh_near_dup_pairs",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "ngram_novelty_scores",
    "strip_frequent_tokens",
    "near_dup_components",
    "dedup_lines_global",
    "dedup_substring_spans",
    "dedup_substring_extent",
    "dedup_substring_scrub",
    "dedup_substring_self_spans",
    "near_dup_components_star",
    "embed_mrl_topk_d16",
    "stream_interval_join_louter",
    "q6_forecast_revenue",
    "q8_national_market_share",
    "q14_promo_revenue",
    "q15_top_supplier",
    "corpus_shuffle_positions",
    "rollup_hourly_reads",
    "ts_corr_pairs",
    "window_ntile_quartiles",
    "argmax_latest_order",
    "bitmask_user_event_flags",
    "ts_moments_skew_kurt",
    "asof_nearest_purchase_to_click",
    "approx_distinct_parts_bound",
    "json_map_events",
    "pivot_events_weekday",
    "text_pii_scrub",
    "text_repetition",
    "ts_outliers_mad",
    "mad_per_series",
    "text_token_stats",
    "text_quality",
    "fingerprint_winnowing",
    "minhash_signatures",
    "pagerank_trade_graph",
    "simhash_docs",
    "embed_norms",
    "embed_cosine_topk",
    "embed_hard_negatives",
    "embed_near_dup_pairs",
    "srp_ann_topk",
    "ivf_ann_topk",
    "ivf_kmeans_probe_all_bound",
    "embed_label_cohesion",
    "multimodal_payload_fp",
    "multimodal_frame_sample",
    "clean_corpus",
    "clean_corpus_gated",
    "window_rank_family",
    "window_range_frame_30d",
    "subquery_exists_big_spenders",
    "subquery_scalar_above_avg",
    "subquery_correlated_above_own_avg",
    "unpivot_lineitem_measures",
    "simhash_near_dup_pairs",
    "chunk_documents_64",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_interval_join",
    "sample_stratified_sources",
    "training_shard_manifest",
    "sample_token_budget_per_source",
    "sample_quota_per_source",
    "heavy_hitter_tokens",
    "collocations_lift_top20",
    "decontaminate_ngrams",
    "timetravel_versions",
    "udtf_token_counts",
    "tfidf_pair_scores",
    "ts_autocorr_lag1",
    "ts_ewma",
    "graph_triangle_count",
    "graph_khop_reach",
    "graph_kcore",
    "graph_link_prediction",
    "graph_link_prediction_ra",
    "graph_label_propagation",
    "hilbert_layout_index",
    "mmr_diversified_topk",
    "retrieval_eval_metrics",
    "hard_negatives_indexed",
    "semdedup_keep",
    "semdedup_gate_replay",
    "pq_rerank_full_pool_bound",
    "ivfpq_rerank_indexed_bound",
    "video_near_dup_rollup",
    "profile_documents",
    "stream_interval_join_fouter",
    "stateful_series_stats",
    "cms_event_type_counts",
    "pack_sequences_512",
    "pack_ffd_bound",
    "bm25_topk",
    "market_basket_lift",
    "edit_distance_near_dups",
    "decontaminate_semantic",
    "prep_training_mix",
    "embed_near_dup_pairs_srp",
    "embed_near_dup_pairs_bucketed",
    "quality_percentile_by_source",
    "histogram_order_totals",
    "corr_quantity_price",
    "chunk_overlap_48_16",
    "embed_cosine_topk_filtered",
    "hybrid_retrieval_rrf",
    "setop_except_all",
    "rollup_grouping_id",
    "stringagg_mktsegment_nations",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q10_returned_items",
    "q18_large_volume_customers",
    "q21_suppliers_kept_waiting",
    "dsir_importance_weights",
    "dsir_resample",
    "ts_cusum_changepoints",
    "ts_linreg_trend",
    "lsh_gate_replay",
    "ts_last_n",
    "ts_first_n",
    "ts_latest",
    "ts_since",
    "ts_range",
    "ts_tag_equals",
    "ts_tag_contains",
    "ts_tag_compound_or",
    "ts_agg_exact",
    "ts_agg_float",
    "ts_filtered_agg",
    "ts_length",
    "ts_names",
    "ts_delta",
    "ts_quantiles",
    "ts_quantiles_approx_bound",
    "interval_overlap_series_days",
    "ts_resample_linear",
    "ts_resample_locf",
    "q1_pricing_summary",
    "join_orders_customer",
    "join_anti_customers_without_orders",
    "top10_orders",
    "window_top3_per_customer",
    "window_order_gap_days",
    "date_trunc_monthly_orders",
    "distinct_mktsegments",
    "scan_checksum",
    "media_banded_near_dup_pairs",
    "media_clean_canonicals",
    "sessionize_events_gaps",
    "embed_quantize_int8",
    "near_dup_keep_best",
    "schema_evolution_versions",
    "funnel_view_click_purchase",
    "cohort_weekly_retention",
    "ts_rate_counter",
    "ts_downsample_m4",
    "ts_downsample_lttb",
    "notin_suppliers_no_returns",
    "sample_weighted_priority",
    "split_train_val_test",
    "bpe_learn_merges",
    "tokenize_bpe",
    "changes_between_feed",
    "lsh_incremental_near_dups",
    "bpe_vocab_top",
    "unigram_learn_vocab",
    "tokenize_unigram",
    "clone_branch_divergence",
]


# Slot-0 canary: a trivially fast metadata query (distinct series names)
# that the driver can always record in milliseconds. Diagnosable ledger:
# an empty CORRECTNESS_r*.json now means "the driver never started", while
# "canary green, nothing else" means "the first real query hung/OOM'd"
# (round-12 verdict task 1a — CORRECTNESS_r12.json came back `{}` with the
# heaviest graph queries fronting the rotation).
_CANARY = "ts_names"

# Measured sf0.1 per-query cost hints (seconds; BENCH_new_ops_r12.json +
# builder sittings) for the unverified front. The driver's correctness
# budget is time-boxed, so the front runs CHEAPEST-FIRST: a partial sweep
# then records maximal coverage before the first heavy query (round-12
# verdict task 1b). Unlisted names default to 1.0 (mid), keeping newly
# declared queries early without starving known-cheap ones.
_FRONT_COST = {
    "unigram_learn_vocab": 1.7,
    "tokenize_unigram": 10.0,
    "dsir_importance_weights": 0.3,
    "ts_ewma": 0.4,
    "ts_linreg_trend": 0.4,
    "ts_cusum_changepoints": 0.4,
    "dsir_resample": 0.45,
    "hilbert_layout_index": 0.5,
    "graph_khop_reach": 0.65,
    "graph_link_prediction_ra": 0.7,
    "mmr_diversified_topk": 0.75,
    "retrieval_eval_metrics": 0.75,
    "bm25_topk": 0.8,
    "graph_label_propagation": 0.85,
    "pack_ffd_bound": 0.9,
    "pq_rerank_full_pool_bound": 1.2,
    "graph_triangle_count": 1.5,
    "hard_negatives_indexed": 1.5,
    "ivfpq_rerank_indexed_bound": 2.0,
    "srp_ann_topk_indexed": 2.0,
    "decontaminate_semantic": 1.5,
    "semdedup_keep": 1.6,
    "market_basket_lift": 1.65,
    "lsh_gate_replay": 2.5,
    "semdedup_gate_replay": 2.6,
    "edit_distance_near_dups": 3.3,
    "graph_kcore": 4.8,
    "graph_link_prediction": 6.0,
    "video_near_dup_rollup": 8.0,
}


def _rotated(reg: dict) -> dict:
    from nibbledb_spark.queries import ORACLE, QUERIES as _ALL

    # _FRONT_COST is free-text name -> cost: a registry rename or a typo
    # would otherwise silently fall back to the 1.0 default and reorder
    # the time-boxed cheapest-first front. Fail loudly instead — but
    # validate against the FULL query registry, not the reg argument:
    # oracle_sql() passes the (smaller) ORACLE dict, and a cost hint on
    # a legitimate no-oracle query must not KeyError that path.
    unknown = sorted(set(_FRONT_COST) - set(_ALL))
    if unknown:
        raise KeyError(
            f"_FRONT_COST keys not in the query registry: {unknown}"
        )
    seen = set(_DRIVER_VERIFIED)
    pos = {n: i for i, n in enumerate(reg)}
    front = [
        n for n in reg if n not in seen and n in ORACLE and n != _CANARY
    ]
    front.sort(key=lambda n: (_FRONT_COST.get(n, 1.0), pos[n]))
    sentinels = [n for n in _DRIVER_VERIFIED if n in reg and n != _CANARY]
    approx = [n for n in reg if n not in seen and n not in ORACLE]
    canary = [_CANARY] if _CANARY in reg else []
    return {n: reg[n] for n in canary + front + sentinels + approx}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each declared query."""
    return _rotated(dict(ORACLE))
