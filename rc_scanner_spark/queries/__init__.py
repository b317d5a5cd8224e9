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
    contract instead of a copy per module).

    tune() runs once per SparkSession object (r14): it only sets
    runtime confs, every one idempotent, but each set is a py4j round
    trip — a 6-table query paid ~70 wasted calls of pure driver
    latency per plan construction, and the grading bench rebuilds
    every plan per sample.  A foreign (driver-supplied) session still
    gets tuned on its first table load."""
    from ..session import tune
    from ..tables import load_table

    if not getattr(spark, "_rc_scanner_tuned", False):
        tune(spark)
        spark._rc_scanner_tuned = True
    return load_table(spark, sf_dir, name)


# Registry iteration order doubles as the external driver's
# verification order (it oracle-checks a fixed-size ~50-entry prefix
# per round).
#
# Rotation ledger (driver checks a ~50-entry prefix per round):
#   r1-r9: see git history of this block (r1-era, scanner/LLM/TPC-H,
#       stale drains; r9 was a zero-commit round that re-sampled r8).
#   r10: the 20 never-sampled batch-33..38 entries + 9 r1-era rows +
#       21 oldest r3-era rows -- CORRECTNESS_r10: 50/50 hash-green.
#   r11: the 20 never-sampled round-10 additions (batches 39-44) in
#       slots 1-20, the 12 round-11 additions (batches 45-47) in
#       slots 21-32, then 18 r3-era drains -- CORRECTNESS_r11: 50/50
#       hash-green, zero overlap with r10.
#   r12: the 20 never-sampled round-12 additions (batches 48-50) in
#       slots 1-20, then the 9 remaining r3-era rows and the oldest
#       21 r4-era rows -- CORRECTNESS_r12: 50/50 hash-green, zero
#       overlap with r11.
#   r13 (THIS ordering, re-emitted by tools/rotate_prefix.py
#       --slots 50 on the closing tree): the 20 never-sampled
#       round-13 additions (batches 51-54) in slots 1-20, then
#       embed_pca_variance at slot 21 -- the registry's last
#       never-sampled entry (rows-only by design: a 64x64
#       eigendecomposition has no SQL twin; its mechanism chain is
#       hash-green via the embed_cov_trace/embed_power_iter portable
#       twins).  Policy change this round (tool +
#       test_rotation_ledger.py): a never-sampled rows-only entry MAY
#       spend one prefix slot to earn its weaker rows-only driver
#       row, because the prefix is all the driver ever checks --
#       self-limiting, as after one round it is sampled and barred
#       again.  Slots 22-50: ALL 29 remaining r4-era rows (join_asof
#       .. window_lag_lead), finishing the staleness tail.  A green
#       CORRECTNESS_r13 prefix makes cumulative driver coverage
#       400/400 with nothing older than r5.
#       Registry additions stay capped at ~20/round
#       so the 50-row window keeps converging.  Enforced by
#       tests/test_rotation_ledger.py against the newest committed
#       CORRECTNESS_r*.json; tools/rotate_prefix.py re-emits the
#       ordering mechanically each round.
#   r14 (THIS ordering, re-emitted by tools/rotate_prefix.py
#       --slots 50 on the r14 opening tree): an optimization round —
#       no registry additions, so the prefix is purely the staleness
#       drain: the 50 oldest sampled rows (all green r5), freshest
#       evidence last.  embed_pca_variance earned its one rows-only
#       row in r13 and is now barred from the prefix again (the
#       test_prefix_is_oracle_backed rule), which is why the r13
#       ordering failed that test on the r14 opening tree until this
#       re-emit.

#   r15 (THIS ordering, re-emitted by tools/rotate_prefix.py
#       --slots 50 on the r15 tree): first use of the TOUCHED tier
#       (r14 verdict item 3): queries whose implementation — any
#       top-level symbol their query fn transitively references, by
#       static AST analysis — changed after the commit that landed
#       their newest driver row outrank the staleness drain, with
#       last-round (r14) rewrites first.  This puts post-rewrite hash
#       rows for the r14 optimization work (markov, haar, spearman,
#       kcore, pagerank, prefix_jaccard, semantic, tfidf_top_terms,
#       embed_random_projection, ...) into CORRECTNESS_r15.  Policy
#       extension: already-sampled rows-only (sql=None) entries are
#       re-admitted to the prefix ONLY when touched — a post-rewrite
#       rows-only row is the only driver evidence channel they have —
#       and must be declared in _PREFIX_ROWS_ONLY_REVERIFY below
#       (audited by test_rotation_ledger.py); untouched rows-only
#       entries sink to the registry tail instead of drifting into
#       the prefix with the staleness drain.
_VERIFICATION_PRIORITY: tuple[str, ...] = (
    "ann_lsh_bucketed",  # rows_only TOUCHED-last-round, row r6
    "ann_recall_eval",  # green TOUCHED-last-round, row r6
    "dedup_minhash_lsh",  # rows_only TOUCHED-last-round, row r6
    "dedup_simhash",  # rows_only TOUCHED-last-round, row r6
    "embed_random_projection",  # green TOUCHED-last-round, row r6
    "graph_kcore",  # green TOUCHED-last-round, row r6
    "join_bloom_pruned",  # green TOUCHED-last-round, row r6
    "basket_association_rules",  # green TOUCHED-last-round, row r7
    "dedup_minhash_accuracy",  # green TOUCHED-last-round, row r7
    "embed_dim_truncation_fidelity",  # green TOUCHED-last-round, row r7
    "embed_pair_distance_hist",  # green TOUCHED-last-round, row r7
    "graph_degree_assortativity",  # green TOUCHED-last-round, row r7
    "graph_hits_bipartite",  # green TOUCHED-last-round, row r7
    "graph_label_propagation",  # green TOUCHED-last-round, row r7
    "graph_local_bridges",  # green TOUCHED-last-round, row r7
    "graph_reach_2hop",  # green TOUCHED-last-round, row r7
    "graph_clustering_coefficient",  # green TOUCHED-last-round, row r9
    "stats_spearman",  # green TOUCHED-last-round, row r10
    "text_novelty_decay",  # green TOUCHED-last-round, row r10
    "graph_community_modularity",  # green TOUCHED-last-round, row r11
    "tfidf_top_terms",  # green TOUCHED-last-round, row r11
    "ann_lsh_portable",  # green TOUCHED-last-round, row r12
    "cluster_kmeans",  # green TOUCHED-last-round, row r12
    "dedup_cc_clusters",  # green TOUCHED-last-round, row r12
    "dedup_cluster_purity",  # green TOUCHED-last-round, row r12
    "dedup_minhash_portable",  # green TOUCHED-last-round, row r12
    "dedup_prefix_jaccard",  # green TOUCHED-last-round, row r12
    "dedup_semantic",  # green TOUCHED-last-round, row r12
    "dedup_simhash_portable",  # green TOUCHED-last-round, row r12
    "graph_pagerank",  # green TOUCHED-last-round, row r12
    "orders_next_order_affinity",  # green TOUCHED-last-round, row r12
    "events_haar_energy",  # green TOUCHED-last-round, row r13
    "events_markov_stationary",  # green TOUCHED-last-round, row r13
    "agg_filtered",  # green TOUCHED since r6
    "agg_ks_drift",  # green TOUCHED since r6
    "agg_ttest_welch",  # green TOUCHED since r6
    "agg_weighted_median",  # green TOUCHED since r6
    "dedup_tfidf_cosine",  # green TOUCHED since r6
    "dedup_winnowing",  # green TOUCHED since r6
    "embed_centroid_outliers",  # green TOUCHED since r6
    "events_ab_bucketing",  # green TOUCHED since r6
    "events_mad_anomaly",  # green TOUCHED since r6
    "join_asof_tolerance",  # green TOUCHED since r6
    "pack_bins_bfd",  # rows_only TOUCHED since r6
    "split_leakage_safe",  # green TOUCHED since r6
    "stats_mann_whitney",  # green TOUCHED since r7
    "join_asof_nearest",  # green TOUCHED since r9
    "dedup_ngram_jaccard",  # green TOUCHED since r10
    "orders_basket_lift",  # green TOUCHED since r11
    "stats_bh_fdr",  # green TOUCHED since r11
    # ---- entries below are outside the 50-slot prefix ----
    "agg_trimmed_mean",  # green TOUCHED since r12
    "events_lateness_profile",  # green TOUCHED since r12
    "stats_cochran_q",  # green TOUCHED since r12
    "stats_kendall_tau",  # green TOUCHED since r12
    "stats_permutation_test",  # green TOUCHED since r12
    "agg_chi2_independence",  # green r6
    "agg_incremental_merge",  # green r6
    "agg_mode",  # green r6
    "agg_salted_twophase",  # green r6
    "dedup_cluster_size_hist",  # green r6
    "embed_label_separation",  # green r6
    "events_autocorr",  # green r6
    "events_changepoint_cusum",  # green r6
    "events_concurrency",  # green r6
    "events_interval_union",  # green r6
    "events_theilsen_trend",  # green r6
    "join_interval_overlap",  # green r6
    "join_null_safe",  # green r6
    "multimodal_audio_plan",  # green r6
    "multimodal_tiles_plan",  # green r6
    "orders_cohort_ltv",  # green r6
    "orders_rfm_segments",  # green r6
    "profile_benford",  # green r6
    "sample_balanced_classes",  # green r6
    "sample_kcenter_coreset",  # green r6
    "sample_reservoir_group",  # green r6
    "seq_global_row_number",  # green r6
    "sketch_hll_intersect",  # green r6
    "sketch_kmv_distinct",  # green r6
    "split_time_holdout",  # green r6
    "text_bpe_pair_merges",  # green r6
    "text_jsd_sources",  # green r6
    "text_rake_keywords",  # green r6
    "window_time_range_rolling",  # green r6
    "agg_gini",  # green r7
    "agg_winsorized_mean",  # green r7
    "embed_exact_dup_vectors",  # green r7
    "events_dow_hour_heatmap",  # green r7
    "events_dow_seasonality",  # green r7
    "events_forecast_backtest",  # green r7
    "events_growth_accounting",  # green r7
    "events_holt_linear",  # green r7
    "events_local_peaks",  # green r7
    "events_max_drawdown",  # green r7
    "events_threshold_suggest",  # green r7
    "events_top_paths",  # green r7
    "filter_rejection_funnel",  # green r7
    "llm_prep_pipeline_v2",  # green r7
    "multimodal_augmentation_plan",  # green r7
    "multimodal_shard_manifest",  # green r7
    "orders_abc_classification",  # green r7
    "orders_interarrival_cv",  # green r7
    "orders_revenue_bridge",  # green r7
    "orders_ship_latency_by_priority",  # green r7
    "orders_survival_km",  # green r7
    "profile_dataset_card",  # green r7
    "profile_partition_checksums",  # green r7
    "sample_gumbel_topk",  # green r7
    "sample_quota_hamilton",  # green r7
    "scd2_consistency_audit",  # green r7
    "sketch_hll_sliding",  # green r7
    "split_kfold",  # green r7
    "stats_ols_group",  # green r7
    "stats_wilson_ci",  # green r7
    "text_char_entropy",  # green r7
    "text_code_detection",  # green r7
    "text_hapax_ratio",  # green r7
    "text_inverted_index",  # green r7
    "text_keyword_tagging",  # green r7
    "text_ngram_coverage_curve",  # green r7
    "text_pmi_cooccur",  # green r7
    "text_ttr_segments",  # green r7
    "text_vocab_oov",  # green r7
    "text_word_length_profile",  # green r7
    "agg_bayes_shrunken_rates",  # green r9
    "agg_cube",  # green r9
    "agg_distinct",  # green r9
    "agg_grouping_sets",  # green r9
    "agg_having",  # green r9
    "agg_median",  # green r9
    "agg_rollup",  # green r9
    "agg_stats",  # green r9
    "agg_theil_index",  # green r9
    "agg_tpch_q1",  # green r9
    "array_ops",  # green r9
    "correlated_subquery",  # green r9
    "cross_join",  # green r9
    "embed_centroid_drift",  # green r9
    "embed_dup_consistency",  # green r9
    "events_anomaly_seasonal_adjusted",  # green r9
    "events_bounce_rate",  # green r9
    "events_error_pchart",  # green r9
    "filter_membership",  # green r9
    "filter_null_threshold",  # green r9
    "filter_threshold_inclusive",  # green r9
    "in_subquery",  # green r9
    "join_anti",  # green r9
    "join_broadcast_dims",  # green r9
    "join_inner_agg",  # green r9
    "join_left_count",  # green r9
    "join_range_bands",  # green r9
    "join_semi",  # green r9
    "json_extract",  # green r9
    "limit_offset",  # green r9
    "map_lookup",  # green r9
    "multimodal_pair_integrity",  # green r9
    "orders_status_mix_by_month",  # green r9
    "pivot",  # green r9
    "posexplode_tokens",  # green r9
    "profile_quality_dup_calibration",  # green r9
    "proj_datetime",  # green r9
    "proj_math",  # green r9
    "proj_string",  # green r9
    "regexp_extract_group",  # green r9
    "scalar_subquery",  # green r9
    "select_mix_planner",  # green r9
    "setop_except",  # green r9
    "setop_except_all",  # green r9
    "setop_intersect",  # green r9
    "text_lang_confusion",  # green r9
    "text_script_mix",  # green r9
    "text_tokenizer_fertility",  # green r9
    "agg_approx_distinct",  # green r10
    "agg_hhi_concentration",  # green r10
    "agg_percentile_approx",  # green r10
    "ann_cosine_topk",  # green r10
    "dedup_embedding_cosine",  # green r10
    "dedup_exact",  # green r10
    "dedup_incremental",  # green r10
    "embed_outlier_mahalanobis",  # green r10
    "events_did_estimator",  # green r10
    "multimodal_binary_meta",  # green r10
    "multimodal_frame_plan",  # green r10
    "orders_backlog_aging",  # green r10
    "orders_price_index_laspeyres",  # green r10
    "orders_seasonality_decomposition",  # green r10
    "orders_tier_migration",  # green r10
    "part_single_source_risk",  # green r10
    "sample_hash_split",  # green r10
    "sample_stratified_neyman",  # green r10
    "scan_api_route",  # green r10
    "scan_attribute_filter",  # green r10
    "scan_date_partition",  # green r10
    "scan_dedup_first",  # green r10
    "scan_filename",  # green r10
    "scan_match_message",  # green r10
    "scan_message",  # green r10
    "scan_pipeline_full",  # green r10
    "scan_regex_hits",  # green r10
    "scan_threshold_disabled",  # green r10
    "scan_verb",  # green r10
    "setop_intersect_all",  # green r10
    "setop_union",  # green r10
    "sort_topk_global",  # green r10
    "stats_cohens_d",  # green r10
    "stats_cuped",  # green r10
    "stats_mann_kendall",  # green r10
    "stats_mcnemar",  # green r10
    "stats_power_mde",  # green r10
    "tpch_q11ish",  # green r10
    "tpch_q20ish",  # green r10
    "tpch_q21ish",  # green r10
    "tpch_q2ish",  # green r10
    "union_by_name",  # green r10
    "window_ntile",  # green r10
    "window_percent_rank",  # green r10
    "window_range_frame",  # green r10
    "window_rank_topk",  # green r10
    "window_running_sum",  # green r10
    "dedup_prefix_hash",  # green r11
    "embed_cov_trace_portable",  # green r11
    "embed_hard_negatives",  # green r11
    "embed_sign_hamming_ann",  # green r11
    "embed_sign_recall_eval",  # green r11
    "embed_silhouette_simplified",  # green r11
    "events_burstiness_fano",  # green r11
    "events_dau_mau_stickiness",  # green r11
    "events_markov_transitions",  # green r11
    "events_poisson_rate_ratio",  # green r11
    "events_power_user_curve",  # green r11
    "events_streaks",  # green r11
    "llm_preference_pairs",  # green r11
    "multimodal_aspect_bucket_plan",  # green r11
    "multimodal_phash_portable",  # green r11
    "orders_repeat_purchase_latency",  # green r11
    "pack_bins_nextfit_portable",  # green r11
    "part_sales_churn",  # green r11
    "select_epoch_mix",  # green r11
    "sketch_hll_daily_rollup",  # green r11
    "sketch_hll_mergeable",  # green r11
    "sql_api_revenue",  # green r11
    "sql_api_top_customers",  # green r11
    "sql_api_window",  # green r11
    "stats_anova_oneway",  # green r11
    "stats_cvm_drift",  # green r11
    "stats_friedman",  # green r11
    "stats_kruskal_wallis",  # green r11
    "stats_levene_brown_forsythe",  # green r11
    "stats_runs_test",  # green r11
    "stats_sprt_conversion",  # green r11
    "stats_tost_equivalence",  # green r11
    "supplier_return_rate",  # green r11
    "text_bytes_portable",  # green r11
    "text_fingerprint",  # green r11
    "text_lang_id",  # green r11
    "text_quality",  # green r11
    "text_repetition",  # green r11
    "text_token_count",  # green r11
    "tpch_q10ish",  # green r11
    "tpch_q13ish",  # green r11
    "tpch_q14ish",  # green r11
    "tpch_q15ish",  # green r11
    "tpch_q16ish",  # green r11
    "tpch_q17ish",  # green r11
    "tpch_q18ish",  # green r11
    "agg_cohens_kappa",  # green r12
    "agg_corr",  # green r12
    "agg_histogram",  # green r12
    "agg_source_entropy",  # green r12
    "agg_string_collect",  # green r12
    "ann_filtered_topk",  # green r12
    "cluster_zorder",  # green r12
    "contract_violations",  # green r12
    "date_arithmetic",  # green r12
    "decontaminate",  # green r12
    "dedup_lsh_band_tuning",  # green r12
    "dedup_paragraph",  # green r12
    "dedup_quality_shift",  # green r12
    "dedup_threshold_sweep",  # green r12
    "embed_power_iter_portable",  # green r12
    "event_funnel",  # green r12
    "events_absence_streaks",  # green r12
    "graph_degree_stats",  # green r12
    "join_asof_forward",  # green r12
    "sample_snis_clipped",  # green r12
    "sample_systematic",  # green r12
    "sketch_kmv_set_ops",  # green r12
    "stats_page_trend",  # green r12
    "text_garbage_score",  # green r12
    "tpch_q19ish",  # green r12
    "tpch_q22ish",  # green r12
    "tpch_q3ish",  # green r12
    "tpch_q4ish",  # green r12
    "tpch_q5ish",  # green r12
    "tpch_q6",  # green r12
    "tpch_q7ish",  # green r12
    "tpch_q8ish",  # green r12
    "tpch_q9ish",  # green r12
    "window_cume_dist",  # green r12
    "window_fill_forward",  # green r12
    "agg_trimmed_mean_bucketed",  # green r13
    "events_attribution_credit",  # green r13
    "events_best_split_sse",  # green r13
    "events_type_user_jaccard",  # green r13
    "join_asof",  # green r13
    "join_bitemporal_asof",  # green r13
    "join_full_outer",  # green r13
    "join_interpolate_linear",  # green r13
    "join_right_outer",  # green r13
    "join_salted_skew",  # green r13
    "merge_upsert",  # green r13
    "orders_fifo_allocation",  # green r13
    "pack_sequences",  # green r13
    "profile_columns",  # green r13
    "sample_interleave_shards",  # green r13
    "sample_negatives",  # green r13
    "sample_pps_systematic",  # green r13
    "sample_stratified",  # green r13
    "sample_weighted_mix",  # green r13
    "scd2_user_state",  # green r13
    "session_windows",  # green r13
    "sql_api_exists",  # green r13
    "sql_api_group_by_all",  # green r13
    "sql_api_lateral",  # green r13
    "sql_api_recursive_cte",  # green r13
    "stats_capture_recapture",  # green r13
    "stats_delta_method_ratio",  # green r13
    "stats_holm_bonferroni",  # green r13
    "stats_psi_drift",  # green r13
    "stats_srm_check",  # green r13
    "stats_two_proportion_z",  # green r13
    "text_bm25_topk",  # green r13
    "text_chunk_overlap",  # green r13
    "text_gopher_rules",  # green r13
    "text_html_strip",  # green r13
    "text_lorenz_curve",  # green r13
    "text_ngram_novelty",  # green r13
    "text_pii_scrub",  # green r13
    "text_readability",  # green r13
    "text_simpson_diversity",  # green r13
    "text_unigram_logprob",  # green r13
    "time_window_tumbling",  # green r13
    "unpivot",  # green r13
    "variant_shred",  # green r13
    "window_hampel_outliers",  # green r13
    "window_lag_lead",  # green r13
    "window_rolling_median",  # green r13
    "agg_argmax",  # green r14
    "agg_group_quantiles",  # green r14
    "ann_ivf_topk",  # green r14
    "ann_ivfpq_topk",  # green r14
    "ann_pq_topk",  # green r14
    "basket_part_pairs",  # green r14
    "batch_length_buckets",  # green r14
    "bootstrap_ci_mean",  # green r14
    "cdc_snapshot_diff",  # green r14
    "dedup_containment",  # green r14
    "dedup_keep_best",  # green r14
    "dedup_pair_explain",  # green r14
    "dedup_rate_by_source",  # green r14
    "dedup_substring_spans",  # green r14
    "embed_quantize_int8",  # green r14
    "er_fuzzy_match",  # green r14
    "event_conversion_latency",  # green r14
    "event_transitions",  # green r14
    "events_cumulative_distinct",  # green r14
    "events_ewma_smooth",  # green r14
    "events_gap_fill",  # green r14
    "events_rate_anomaly",  # green r14
    "events_retention_cohorts",  # green r14
    "events_rolling_active_users",  # green r14
    "filter_source_blocklist",  # green r14
    "graph_link_prediction",  # green r14
    "graph_triangle_count",  # green r14
    "llm_prep_pipeline",  # green r14
    "multimodal_features",  # green r14
    "profile_key_skew",  # green r14
    "profile_quality_by_source",  # green r14
    "retrieval_rrf_fusion",  # green r14
    "sample_cluster_balanced",  # green r14
    "sample_poisson_bootstrap",  # green r14
    "sample_temperature_mix",  # green r14
    "sample_uniform_k",  # green r14
    "select_dsir",  # green r14
    "select_pareto_frontier",  # green r14
    "select_token_budget",  # green r14
    "sketch_bloom_membership",  # green r14
    "sketch_countmin_topk",  # green r14
    "sketch_quantile_bounded",  # green r14
    "source_overlap_matrix",  # green r14
    "text_bigram_logprob",  # green r14
    "text_lang_mix",  # green r14
    "text_zipf_fit",  # green r14
    "time_window_sliding",  # green r14
    "tpch_q12ish",  # green r14
    "window_first_last",  # green r14
    "window_period_over_period",  # green r14
    "multimodal_phash_neardup",  # rows_only r6
    "text_compression_ratio",  # rows_only r6
    "embed_pca_variance",  # rows_only r13
)


_PREFIX_ROWS_ONLY_REVERIFY: tuple[str, ...] = (
    "ann_lsh_bucketed",  # touched since rows-only row r6
    "dedup_minhash_lsh",  # touched since rows-only row r6
    "dedup_simhash",  # touched since rows-only row r6
    "pack_bins_bfd",  # touched since rows-only row r6
)





def build_registry() -> dict[str, QuerySpec]:
    from . import (
        llm,
        llm2,
        llm3,
        llm4,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
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
        warehouse25,
        warehouse26,
        warehouse27,
        warehouse28,
        warehouse29,
        warehouse30,
        warehouse31,
        warehouse32,
        warehouse33,
        warehouse34,
        warehouse35,
        warehouse36,
        warehouse37,
    )

    flat: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        sql_api,
        scanner_queries,
        llm,
        llm2,
        llm3,
        llm4,
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
        warehouse25,
        warehouse26,
        warehouse27,
        warehouse28,
        warehouse29,
        warehouse30,
        warehouse31,
        warehouse32,
        warehouse33,
        warehouse34,
        warehouse35,
        warehouse36,
        warehouse37,
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
