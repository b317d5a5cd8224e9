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
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the single best right row with
    the same key under ``direction``:

    * ``backward`` (default) — the latest right_ts <= left_ts;
    * ``forward`` — the earliest right_ts >= left_ts (tie: smallest
      right id) — "next event after", the lookahead mirror of
      backward;
    * ``nearest`` — the smallest |right_ts - left_ts| within
      ``tolerance`` (REQUIRED for nearest: an unbounded nearest match
      would force unbounded join fan-out); an equidistant
      before/after pair resolves to the BACKWARD row (pandas
      merge_asof semantics), then the smallest right id column.

    Implementation: equi-join on the key + window pick.  This shuffles
    both sides once on ``key`` and is robust to many matches per key;
    when the per-key match fan-out is huge, pre-aggregate the right
    side into time buckets first (the sort-merge-join + filter still
    beats a cross join).  Deterministic tie-break: backward — latest
    right_ts then largest right id; forward — earliest right_ts then
    smallest right id; nearest — smallest |gap|, earlier right_ts
    (the backward one), then smallest right id — callers should pass
    a unique column first in ``right_cols``.

    The matched right timestamp is returned as the documented column
    ``asof_matched_ts`` (NULL when no match); internal helper columns
    are dropped.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unsupported asof direction {direction!r}")
    if direction == "nearest" and tolerance is None:
        raise ValueError("nearest as-of requires a tolerance bound")
    lid = "__asof_lid"
    l = left.withColumn(lid, F.monotonically_increasing_id())
    r = right.select(
        F.col(key).alias("__rkey"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in right_cols],
    )
    cond = F.col(key) == F.col("__rkey")
    if direction == "backward":
        cond = cond & (F.col("__rts") <= F.col(left_ts))
        if tolerance is not None:
            cond = cond & (F.col("__rts") >= F.col(left_ts) - tolerance)
        order = [
            F.col("__rts").desc_nulls_last(),
            *[F.col(c).desc_nulls_last() for c in right_cols[:1]],
        ]
    elif direction == "forward":
        cond = cond & (F.col("__rts") >= F.col(left_ts))
        if tolerance is not None:
            cond = cond & (F.col("__rts") <= F.col(left_ts) + tolerance)
        order = [
            F.col("__rts").asc_nulls_last(),
            *[F.col(c).asc_nulls_last() for c in right_cols[:1]],
        ]
    else:
        cond = (
            cond
            & (F.col("__rts") >= F.col(left_ts) - tolerance)
            & (F.col("__rts") <= F.col(left_ts) + tolerance)
        )
        gap = F.abs(
            F.unix_micros(F.col("__rts")) - F.unix_micros(F.col(left_ts))
        )
        order = [
            gap.asc_nulls_last(),
            F.col("__rts").asc_nulls_last(),
            *[F.col(c).asc_nulls_last() for c in right_cols[:1]],
        ]
    joined = l.join(r, on=cond, how="left")
    w = Window.partitionBy(lid).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .withColumn("asof_matched_ts", F.col("__rts"))
        .drop("__rn", "__rkey", "__rts", lid)
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


def pack_bins_bfd(
    docs: DataFrame,
    budget: int = 2048,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Best-fit-decreasing bin packing of documents into token-budget
    bins, per group — the quality upgrade over contiguous packing
    (queries/llm.py pack_sequences) when sequences must not split
    documents.

    BFD is inherently sequential (each placement depends on all prior
    placements), which Catalyst cannot express — this is the
    documented applyInPandas escape hatch: per-group Arrow batches,
    group state = the open-bin fill table, bounded by
    group_tokens/budget bins.  Groups are independent, so parallelism
    is the group count; determinism comes from the (tokens desc, id)
    placement order.  Oversized docs (> budget) get a bin of their
    own, fill > 1.0.

    Returns (group, id, n_tokens, bin_id, bin_fill_after).
    """
    import pandas as pd

    # the group column keeps its INPUT type (hardcoding string would
    # make Arrow choke on an int-typed group key)
    group_type = docs.schema[group_col].dataType.simpleString()
    out_schema = (
        f"{group_col} {group_type}, {id_col} long, {tokens_col} long, "
        "bin_id long, bin_fill_after double"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []  # fill level per bin id
        rows = []
        for _, r in pdf.iterrows():
            t = int(r[tokens_col])
            # best fit: fullest bin that still takes t
            best, best_fill = -1, -1
            for b, f in enumerate(fills):
                if f + t <= budget and f > best_fill:
                    best, best_fill = b, f
            if best < 0:
                fills.append(0)
                best = len(fills) - 1
            fills[best] += t
            rows.append(
                (r[group_col], int(r[id_col]), t, best, fills[best] / budget)
            )
        return pd.DataFrame(
            rows,
            columns=[group_col, id_col, tokens_col, "bin_id", "bin_fill_after"],
        )

    return docs.select(group_col, id_col, tokens_col).groupBy(group_col).applyInPandas(
        pack, schema=out_schema
    )
