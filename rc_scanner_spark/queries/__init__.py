"""The query registry: every operator from SURVEY.md §2 as a named
(PySpark builder, DuckDB oracle SQL) pair.

``QUERIES[name] = QuerySpec(fn, sql)`` where ``fn(spark, sf_dir) ->
DataFrame`` and ``sql`` is the ANSI-SQL twin DuckDB runs on the same
parquet tables (views: region nation customer supplier part orders
lineitem events documents embeddings).  ``sql=None`` marks genuinely
non-SQL-expressible ops (hash-function-dependent LSH internals) — the
driver then records a weaker rows-only check.

Alias discipline: every computed column is aliased identically on both
sides (the driver sorts columns by name before hashing values).
Doubles are rounded on both sides; counts are BIGINT on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]


def load_tuned(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """tune() + load_table — the shared per-query table loader every
    query module aliases as ``_t`` (one definition of the load/tune
    contract instead of a copy per module)."""
    from ..session import tune
    from ..tables import load_table

    tune(spark)
    return load_table(spark, sf_dir, name)


# Registry iteration order doubles as the external driver's
# verification order (it oracle-checks a fixed-size ~50-entry prefix
# per round).

_VERIFICATION_PRIORITY: tuple[str, ...] = (
    # Rotation ledger (driver checks a ~50-entry prefix per round):
    #   r1: first 50 of the then-module order (the "r1-era" block).
    #   r2+r3: scanner/LLM/TPC-H/SQL-API prefix (CORRECTNESS_r03.json).
    #   r4: stale events rows + 45 never-checked (50/50 green).
    #   r5: 15 never-checked/re-fixed + round-5 additions (50/50 green).
    #   r6: 43 never-checked oracle-backed + 6 rows-only + 1 spill
    #       (44 full-green + 6 rows-only-by-design, CORRECTNESS_r06).
    #   r7 (THIS ordering): the 51 oracle-backed entries with NO driver
    #       row through r6 (round-6 batches 11-27 minus the r6-sampled
    #       agg_incremental_merge and minus rows-only embed_pca_variance)
    #       — closes cumulative driver coverage at >=292/293.  Rows-only
    #       (sql=None) entries are EXCLUDED from the prefix: each already
    #       has its one driver row, and re-sampling burns a hash-checked
    #       slot on an `err: no_oracle` print.  Enforced by
    #       tests/test_rotation_ledger.py against the newest committed
    #       CORRECTNESS_r*.json.
    #   Drain schedule (r8+): the r1-era block directly below the prefix
    #       is next — by end of r8 no entry's newest driver row should
    #       predate r4.  Registry additions are capped at ~20/round so
    #       the 50-row window can keep converging.
    "events_dow_seasonality",
    "text_keyword_tagging",
    "graph_label_propagation",
    "text_inverted_index",
    "split_kfold",
    "embed_pair_distance_hist",
    "basket_association_rules",
    "agg_gini",
    "stats_mann_whitney",
    "text_ttr_segments",
    "multimodal_shard_manifest",
    "orders_survival_km",
    "events_holt_linear",
    "text_vocab_oov",
    "graph_reach_2hop",
    "stats_ols_group",
    "events_growth_accounting",
    "events_top_paths",
    "stats_wilson_ci",
    "sample_gumbel_topk",
    "embed_dim_truncation_fidelity",
    "text_pmi_cooccur",
    "orders_abc_classification",
    "sketch_hll_sliding",
    "profile_partition_checksums",
    "events_forecast_backtest",
    "graph_local_bridges",
    "multimodal_augmentation_plan",
    "text_code_detection",
    "graph_hits_bipartite",
    "filter_rejection_funnel",
    "events_local_peaks",
    "orders_ship_latency_by_priority",
    "text_ngram_coverage_curve",
    "events_max_drawdown",
    "llm_prep_pipeline_v2",
    "profile_dataset_card",
    "dedup_minhash_accuracy",
    "events_dow_hour_heatmap",
    "orders_interarrival_cv",
    "scd2_consistency_audit",
    "orders_revenue_bridge",
    "embed_exact_dup_vectors",
    "sample_quota_hamilton",
    "agg_winsorized_mean",
    "text_char_entropy",
    "events_threshold_suggest",
    "graph_degree_assortativity",
    "text_word_length_profile",
    "text_hapax_ratio",
    "orders_status_mix_by_month",
    # -- rows-only, never hash-checkable; its weaker rows-only driver
    #    row lands whenever the window spills past the 51 above.
    "embed_pca_variance",
    # -- batch-28 additions (round 7, capped per the drain schedule):
    #    never driver-sampled, oracle-backed — they queue behind the
    #    prefix and head the r8 rotation with the spill above.
    "text_lang_confusion",
    "embed_centroid_drift",
    "graph_clustering_coefficient",
    "agg_theil_index",
    "select_mix_planner",
    # -- batch-29 additions.
    "profile_quality_dup_calibration",
    "events_error_pchart",
    # -- batch-30 additions.
    "join_asof_nearest",
    "text_script_mix",
    "events_bounce_rate",
    # -- batch-31 additions.
    "multimodal_pair_integrity",
    # -- batch-32 additions.
    "agg_bayes_shrunken_rates",
    "events_anomaly_seasonal_adjusted",
    "text_tokenizer_fertility",
    "embed_dup_consistency",
    # -- r1-era block: oldest driver rows (CORRECTNESS_r01), the r8
    #    drain target.
    "filter_membership",
    "filter_null_threshold",
    "filter_threshold_inclusive",
    "proj_string",
    "proj_datetime",
    "proj_math",
    "json_extract",
    "array_ops",
    "map_lookup",
    "join_inner_agg",
    "join_left_count",
    "join_semi",
    "join_anti",
    "join_broadcast_dims",
    "join_range_bands",
    "agg_tpch_q1",
    "agg_distinct",
    "agg_stats",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "window_rank_topk",
    "window_running_sum",
    "window_ntile",
    "window_range_frame",
    "sort_topk_global",
    "setop_union",
    "setop_intersect",
    "setop_except",
    "pivot",
    "correlated_subquery",
    "agg_having",
    "agg_median",
    "window_percent_rank",
    "regexp_extract_group",
    "posexplode_tokens",
    "cross_join",
    "union_by_name",
    "setop_intersect_all",
    "setop_except_all",
    "scalar_subquery",
    "in_subquery",
    "limit_offset",
    # -- r3/r4/r5-green tail (most recent evidence).
    "ann_ivf_topk",
    "multimodal_features",
    "retrieval_rrf_fusion",
    "select_token_budget",
    "filter_source_blocklist",
    "batch_length_buckets",
    "sample_cluster_balanced",
    "sketch_countmin_topk",
    "events_rate_anomaly",
    "event_transitions",
    "profile_quality_by_source",
    "dedup_pair_explain",
    "dedup_rate_by_source",
    "llm_prep_pipeline",
    "tpch_q12ish",
    "embed_quantize_int8",
    "ann_pq_topk",
    "sketch_bloom_membership",
    "dedup_keep_best",
    "text_bigram_logprob",
    "dedup_containment",
    "sketch_quantile_bounded",
    "select_dsir",
    "ann_ivfpq_topk",
    "sample_temperature_mix",
    "events_gap_fill",
    "events_retention_cohorts",
    "basket_part_pairs",
    "cdc_snapshot_diff",
    "events_rolling_active_users",
    "events_ewma_smooth",
    "time_window_sliding",
    "graph_triangle_count",
    "dedup_substring_spans",
    "select_pareto_frontier",
    "source_overlap_matrix",
    "agg_argmax",
    "window_first_last",
    "profile_key_skew",
    "agg_group_quantiles",
    "text_zipf_fit",
    "sample_poisson_bootstrap",
    "text_lang_mix",
    "bootstrap_ci_mean",
    "er_fuzzy_match",
    "window_period_over_period",
    "sample_uniform_k",
    "events_cumulative_distinct",
    "graph_link_prediction",
    "event_conversion_latency",
    "join_asof",
    "window_lag_lead",
    "session_windows",
    "time_window_tumbling",
    "date_arithmetic",
    "decontaminate",
    "dedup_cc_clusters",
    "pack_sequences",
    "merge_upsert",
    "scd2_user_state",
    "graph_pagerank",
    "text_bm25_topk",
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "ann_lsh_portable",
    "unpivot",
    "join_salted_skew",
    "join_full_outer",
    "join_right_outer",
    "agg_corr",
    "agg_string_collect",
    "dedup_paragraph",
    "text_pii_scrub",
    "sample_weighted_mix",
    "sql_api_recursive_cte",
    "sql_api_exists",
    "sql_api_lateral",
    "text_chunk_overlap",
    "sample_stratified",
    "profile_columns",
    "event_funnel",
    "text_unigram_logprob",
    "agg_histogram",
    "cluster_zorder",
    "variant_shred",
    "dedup_prefix_jaccard",
    "sample_negatives",
    "agg_cohens_kappa",
    "sample_interleave_shards",
    "text_readability",
    "agg_source_entropy",
    "text_ngram_novelty",
    "text_gopher_rules",
    "text_html_strip",
    "ann_filtered_topk",
    "sql_api_group_by_all",
    "contract_violations",
    "graph_degree_stats",
    "cluster_kmeans",
    "dedup_semantic",
    "scan_pipeline_full",
    "scan_attribute_filter",
    "scan_threshold_disabled",
    "scan_regex_hits",
    "scan_dedup_first",
    "scan_api_route",
    "scan_verb",
    "scan_message",
    "scan_match_message",
    "scan_date_partition",
    "scan_filename",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_incremental",
    "ann_cosine_topk",
    "text_lang_id",
    "text_quality",
    "text_repetition",
    "text_token_count",
    "text_fingerprint",
    "tfidf_top_terms",
    "sample_hash_split",
    "multimodal_frame_plan",
    "multimodal_binary_meta",
    "sketch_hll_mergeable",
    "sketch_hll_daily_rollup",
    "agg_approx_distinct",
    "agg_percentile_approx",
    "tpch_q3ish",
    "tpch_q4ish",
    "tpch_q5ish",
    "tpch_q6",
    "tpch_q7ish",
    "tpch_q8ish",
    "tpch_q9ish",
    "tpch_q10ish",
    "tpch_q13ish",
    "tpch_q14ish",
    "tpch_q15ish",
    "tpch_q16ish",
    "tpch_q17ish",
    "tpch_q18ish",
    "tpch_q19ish",
    "tpch_q22ish",
    "sql_api_revenue",
    "sql_api_top_customers",
    "sql_api_window",
    # -- r6-sampled block (CORRECTNESS_r06): the newest driver evidence
    #    in the repo — last in line for re-verification.
    "events_concurrency",
    "agg_filtered",
    "split_leakage_safe",
    "join_null_safe",
    "dedup_cluster_size_hist",
    "events_mad_anomaly",
    "ann_recall_eval",
    "sketch_hll_intersect",
    "agg_weighted_median",
    "embed_centroid_outliers",
    "join_interval_overlap",
    "events_interval_union",
    "agg_mode",
    "join_bloom_pruned",
    "agg_salted_twophase",
    "sample_reservoir_group",
    "window_time_range_rolling",
    "text_rake_keywords",
    "agg_ks_drift",
    "agg_chi2_independence",
    "agg_ttest_welch",
    "text_jsd_sources",
    "events_changepoint_cusum",
    "join_asof_tolerance",
    "multimodal_audio_plan",
    "text_bpe_pair_merges",
    "sample_kcenter_coreset",
    "events_autocorr",
    "orders_rfm_segments",
    "dedup_tfidf_cosine",
    "sample_balanced_classes",
    "embed_label_separation",
    "orders_cohort_ltv",
    "events_ab_bucketing",
    "sketch_kmv_distinct",
    "split_time_holdout",
    "graph_kcore",
    "multimodal_tiles_plan",
    "dedup_winnowing",
    "seq_global_row_number",
    "events_theilsen_trend",
    "profile_benford",
    "embed_random_projection",
    "multimodal_phash_neardup",
    "text_compression_ratio",
    "pack_bins_bfd",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_bucketed",
    "agg_incremental_merge",
)


def build_registry() -> dict[str, QuerySpec]:
    from . import (
        llm,
        llm2,
        llm3,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        scanner_queries,
        sketches,
        sql_api,
        stats,
        warehouse,
        warehouse2,
        warehouse3,
        warehouse4,
        warehouse5,
        warehouse6,
        warehouse7,
        warehouse8,
        warehouse9,
        warehouse10,
        warehouse11,
        warehouse12,
        warehouse13,
        warehouse14,
        warehouse15,
        warehouse16,
        warehouse17,
        warehouse18,
        warehouse19,
        warehouse20,
        warehouse21,
        warehouse22,
        warehouse23,
        warehouse24,
    )

    flat: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        sql_api,
        scanner_queries,
        llm,
        llm2,
        llm3,
        sketches,
        stats,
        warehouse,
        warehouse2,
        warehouse3,
        warehouse4,
        warehouse5,
        warehouse6,
        warehouse7,
        warehouse8,
        warehouse9,
        warehouse10,
        warehouse11,
        warehouse12,
        warehouse13,
        warehouse14,
        warehouse15,
        warehouse16,
        warehouse17,
        warehouse18,
        warehouse19,
        warehouse20,
        warehouse21,
        warehouse22,
        warehouse23,
        warehouse24,
    ):
        for name, spec in mod.QUERIES.items():
            if name in flat:
                raise ValueError(f"duplicate query name {name}")
            flat[name] = spec

    missing = [n for n in _VERIFICATION_PRIORITY if n not in flat]
    if missing:
        raise ValueError(f"priority list names unknown queries: {missing}")
    out: dict[str, QuerySpec] = {n: flat[n] for n in _VERIFICATION_PRIORITY}
    for name, spec in flat.items():
        if name not in out:
            out[name] = spec
    return out
