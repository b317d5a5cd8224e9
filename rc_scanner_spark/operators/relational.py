"""Relational operators Spark lacks as single calls: as-of join, range
join, top-k per group, sessionization.

All are compositions of built-in DataFrame ops (SURVEY.md §2.B "joins"
row): Catalyst plans the shuffles; we control the join shape so the
plan survives a 100x scale-up (broadcast small sides, equi-join keys
first, never an unbounded cross join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group: single shuffle on the group keys, rank
    inside the window.  ``order_cols`` must make the order total
    (include a unique tiebreaker) for deterministic results."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row
    with the same key and right_ts <= left_ts.

    Implementation: equi-join on the key + window pick of the max
    right_ts.  This shuffles both sides once on ``key`` and is robust
    to many matches per key; when the per-key match fan-out is huge,
    pre-aggregate the right side into time buckets first (the
    sort-merge-join + filter still beats a cross join).  Deterministic
    tie-break: latest right_ts, then largest right id column (first of
    right_cols) — callers should pass a unique column first.
    """
    lid = "__asof_lid"
    l = left.withColumn(lid, F.monotonically_increasing_id())
    r = right.select(
        F.col(key).alias("__rkey"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in right_cols],
    )
    cond = (F.col(key) == F.col("__rkey")) & (F.col("__rts") <= F.col(left_ts))
    if tolerance is not None:
        cond = cond & (F.col("__rts") >= F.col(left_ts) - tolerance)
    joined = l.join(r, on=cond, how="left")
    w = Window.partitionBy(lid).orderBy(
        F.col("__rts").desc_nulls_last(),
        *[F.col(c).desc_nulls_last() for c in right_cols[:1]],
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__rkey", lid)
    )


def range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value: Column,
    lo: Column,
    hi: Column,
) -> DataFrame:
    """Join facts to [lo, hi) ranges.  The ranges side is broadcast
    (dimension tables of bands/tiers are small by construction), so
    the physical plan is a BroadcastNestedLoopJoin with a pushed
    band predicate — no shuffle of the fact table at all."""
    return facts.join(F.broadcast(ranges), on=(value >= lo) & (value < hi))


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: str,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_seconds``.

    lag + cumulative-sum over one window — a single shuffle on the
    key.  The streaming twin is ``session_window`` (streaming/).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col(order_tiebreak))
    us = F.unix_micros(F.col(ts))
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
