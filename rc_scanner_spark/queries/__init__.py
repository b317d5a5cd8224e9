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


# Registry iteration order doubles as the external driver's
# verification order (it oracle-checks a fixed-size prefix per round).
# Round 1 verified the first 50 entries of the module order —
# relational basics through the join/agg/window families (all green,
# CORRECTNESS_r01.json).  Round 2 therefore leads with everything that
# round did NOT reach: the scanner-semantics queries (the engine's
# reason to exist), the LLM dedup/ANN/text operators, the
# re-strengthened approximate aggregates, the TPC-H shapes, and the
# SQL API — so the combined r1+r2 evidence covers the registry.
#
# ROUND 3 TODO: after CORRECTNESS_r02 lands, rotate again — move the
# entries past position 50 of THIS list (everything from "unpivot"
# down: the 6 remaining relational queries, the round-2 additions, and
# the k-means/multimodal oracle upgrades) into the checked prefix, and
# push the r1+r2-green entries to the back.  Everything in this file
# below position ~50 has local-pytest parity but no driver row yet.
_VERIFICATION_PRIORITY: tuple[str, ...] = (
    # scanner semantics (reference parity, incl. the flagship)
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
    # LLM-pipeline operators with SQL oracles
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_incremental",
    "ann_cosine_topk",
    "llm_prep_pipeline",
    "text_lang_id",
    "text_quality",
    "text_repetition",
    "text_token_count",
    "text_fingerprint",
    "tfidf_top_terms",
    "sample_hash_split",
    "multimodal_frame_plan",
    "multimodal_binary_meta",
    # mergeable sketches + approximate aggregates (bounded-error oracles)
    "sketch_hll_mergeable",
    "sketch_hll_daily_rollup",
    "agg_approx_distinct",
    "agg_percentile_approx",
    # TPC-H shapes
    "tpch_q3ish",
    "tpch_q4ish",
    "tpch_q5ish",
    "tpch_q6",
    "tpch_q7ish",
    "tpch_q8ish",
    "tpch_q9ish",
    "tpch_q10ish",
    "tpch_q12ish",
    "tpch_q13ish",
    "tpch_q14ish",
    "tpch_q15ish",
    "tpch_q16ish",
    "tpch_q17ish",
    "tpch_q18ish",
    "tpch_q19ish",
    "tpch_q22ish",
    # SQL text interface
    "sql_api_revenue",
    "sql_api_top_customers",
    "sql_api_window",
    # remaining round-1-unchecked relational queries
    "unpivot",
    "join_salted_skew",
    "join_full_outer",
    "join_right_outer",
    "agg_corr",
    "agg_string_collect",
    # round-2 additions (past this round's 50-entry window; round 3
    # leads with whatever remains unchecked)
    "decontaminate",
    "dedup_paragraph",
    "text_pii_scrub",
    "sample_weighted_mix",
    "sql_api_recursive_cte",
    "sql_api_exists",
    "sql_api_lateral",
    "dedup_cc_clusters",
    "pack_sequences",
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
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "ann_lsh_portable",
    "graph_degree_stats",
    # k-means family: full oracles via unrolled-Lloyd SQL (every
    # decision float is rounded before comparison on both sides)
    "cluster_kmeans",
    "dedup_semantic",
    "ann_ivf_topk",
    # the fake codec is deterministic byte arithmetic -> SQL-replayable
    "multimodal_features",
    # sequential-algorithm op (BFD bin packing): rows-only by design,
    # exact pure-Python ground truth in tests
    "pack_bins_bfd",
    # xxhash64-dependent production forms (rows-only — DuckDB has no
    # xxhash64).  Each mechanism is nonetheless externally verified via
    # its md5-based portable twin above (dedup_minhash_portable,
    # dedup_simhash_portable, ann_lsh_portable): identical pipeline
    # shape, hash-matched oracle.
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_bucketed",
    # warehouse-maintenance + retrieval family (round-2 tail; rotate
    # into the checked prefix with the rest in round 3)
    "merge_upsert",
    "scd2_user_state",
    "graph_pagerank",
    "text_bm25_topk",
)


def build_registry() -> dict[str, QuerySpec]:
    from . import (
        llm,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        scanner_queries,
        sketches,
        sql_api,
        warehouse,
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
        sketches,
        warehouse,
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
