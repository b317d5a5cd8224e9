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
    any rollup of the grouping columns.

    Bounded-error oracle: DataSketches estimates are deterministic but
    engine-specific, so the output is the EXACT distinct count plus a
    within-5%-of-exact boolean derived from the sketch estimate
    (lgK 12 -> ~1.6% rse; measured <=0.4% at every SF) — both columns
    hash-compare against the DuckDB twin (exact count, TRUE)."""
    e = _t(spark, sf_dir, "events")
    per_group = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    leaves = per_group.select(
        "event_type", "exact_users", F.hll_sketch_estimate("sk").alias("a")
    )
    global_exact = e.agg(F.countDistinct("user_id").alias("exact_users"))
    merged = (
        per_group.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(F.broadcast(global_exact))
        .select(
            F.lit("ALL").alias("event_type"),
            "exact_users",
            F.hll_sketch_estimate("sk").alias("a"),
        )
    )
    return leaves.unionByName(merged).select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("a") - F.col("exact_users")) / F.col("exact_users") <= 0.05
        ).alias("approx_ok"),
    )


SQL_SKETCH_HLL_MERGEABLE = """
SELECT event_type, count(DISTINCT user_id) AS exact_users, TRUE AS approx_ok
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL' AS event_type, count(DISTINCT user_id) AS exact_users,
       TRUE AS approx_ok
FROM events
"""


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
    rolled = (
        summary.groupBy("day")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select("day", F.hll_sketch_estimate("sk").alias("a"))
    )
    exact = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return rolled.join(exact, "day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "exact_users",
        (
            F.abs(F.col("a") - F.col("exact_users")) / F.col("exact_users") <= 0.05
        ).alias("approx_ok"),
    )


SQL_SKETCH_HLL_DAILY_ROLLUP = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS approx_ok
FROM events GROUP BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "sketch_hll_mergeable": QuerySpec(
        q_sketch_hll_mergeable, SQL_SKETCH_HLL_MERGEABLE
    ),
    "sketch_hll_daily_rollup": QuerySpec(
        q_sketch_hll_daily_rollup, SQL_SKETCH_HLL_DAILY_ROLLUP
    ),
}
