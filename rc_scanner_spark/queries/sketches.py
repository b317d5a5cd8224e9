"""Mergeable-sketch aggregations (Apache DataSketches HLL, built into
Spark 3.5+/4.x as ``hll_sketch_agg`` / ``hll_union_agg``).

Why these are first-class at 100 TB: an exact ``countDistinct`` over a
petabyte-scale key column shuffles every distinct key once per query.
A sketch aggregates each partition to a KB-sized binary, merges
sketches (commutative slot-max -> order/partitioning independent), and
- critically - the *stored* per-group sketches re-aggregate to any
coarser grouping without touching the raw data again: the pre-computed
cube pattern the reference's single-pass scanner could never express.

DuckDB's approx_count_distinct uses a different HLL implementation, so
estimates differ -> ``sql=None`` (rows-only driver check).  Numeric
ground truth (relative error vs exact, partitioning invariance) lives
in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..tables import load_table
from . import QuerySpec

# lgConfigK = 12 -> 4 KiB sketches, ~1.6% relative standard error:
# small enough to broadcast thousands of group sketches, tight enough
# to trust facet counts.
LG_K = 12


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


def q_sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct-user count from ONE pass over events: build a
    per-event_type HLL sketch of user_id, estimate each, then re-merge
    the (tiny) sketches into the global estimate - the second level
    reads KB of sketch bytes, not the events table.  At cluster scale
    the per-group sketches would persist as a summary table serving
    any rollup of the grouping columns."""
    e = _t(spark, sf_dir, "events")
    per_group = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sk")
    )
    leaves = per_group.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    merged = per_group.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    return leaves.unionByName(merged)


def q_sketch_hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-summary-table pattern: persistable (day, event_type)
    sketches re-aggregated to per-day distinct users by merging
    sketches across event_type - exactly how a 100 TB events lake
    serves interactive distinct-count rollups (the raw scan happens
    once; every downstream rollup is a sketch merge)."""
    e = _t(spark, sf_dir, "events")
    summary = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sk"))
    return (
        summary.groupBy("day")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select("day", F.hll_sketch_estimate("sk").alias("approx_users"))
    )


QUERIES: dict[str, QuerySpec] = {
    "sketch_hll_mergeable": QuerySpec(q_sketch_hll_mergeable, None),
    "sketch_hll_daily_rollup": QuerySpec(q_sketch_hll_daily_rollup, None),
}
