"""Round-12 batch 50: the forward as-of direction, IGNORE-NULLS
forward fill, per-shard systematic sampling, and absence streaks.

* ``join_asof_forward`` — the lookahead mirror of ``join_asof``:
  each purchase paired with the same user's EARLIEST subsequent
  click ("time-to-next-touch"), via the shared asof_join operator's
  new ``forward`` direction.
* ``window_fill_forward`` — last-observation-carried-forward over a
  per-user event sequence with synthetic sensor dropout (the value is
  observed only on non-view events): the IGNORE NULLS window surface
  (Spark ``last(ignorenulls)`` vs DuckDB ``last_value(... IGNORE
  NULLS)``) the registry did not yet exercise.
* ``sample_systematic`` — per-source systematic sampling: every 10th
  document in md5-hash order within each source shard.  Hash order
  makes "systematic" immune to storage-order bias; per-shard keeps
  the rank window partitioned (the 100 TB shape: one pass per shard,
  no global sort).
* ``events_absence_streaks`` — the longest INACTIVITY gap in days per
  user (the churn-risk mirror of events_streaks' presence runs),
  reported as a histogram.

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; extends SURVEY.md §2.B's join/window/sampling
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned
from .warehouse28 import _US_PER_DAY

_t = load_tuned


# --------------------------------------------------------------------
# forward as-of join
# --------------------------------------------------------------------


def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each purchase paired with the same user's
    EARLIEST subsequent click — the conversion-followup latency
    question the backward join cannot answer.  Tie-break mirrors the
    operator contract: earliest click_ts, then smallest click id.

    Scale: identical shape to join_asof — one equi-join shuffle on
    user_id + a per-left-row window pick."""
    from ..operators.relational import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    out = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_event_id"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "click_event_id",
        (
            F.unix_micros(F.col("asof_matched_ts")) - F.unix_micros(F.col("ts"))
        ).alias("gap_us"),
    )


SQL_JOIN_ASOF_FORWARD = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id AS click_event_id, ts AS click_ts
           FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, c.click_event_id,
       epoch_us(c.click_ts) - epoch_us(p.ts) AS gap_us
FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.click_ts >= p.ts
QUALIFY row_number() OVER (PARTITION BY p.event_id
                           ORDER BY c.click_ts ASC NULLS LAST,
                                    c.click_event_id ASC NULLS LAST) = 1
"""


# --------------------------------------------------------------------
# IGNORE NULLS forward fill
# --------------------------------------------------------------------


def q_window_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward per user: the value is
    OBSERVED only on non-view events (view = synthetic sensor
    dropout, documented rule so both engines build identical NULLs);
    each event reports the latest observed cents at-or-before it in
    (ts, event_id) order.  Exercises the IGNORE NULLS window surface:
    Spark ``last(col, ignorenulls=True)`` === DuckDB
    ``last_value(col IGNORE NULLS)`` over the running frame.

    Scale: one per-user window — bounded partitions, one shuffle."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.col("event_type") != "view",
            F.floor(F.col("value") * 100 + 0.5).cast("long"),
        ).alias("obs_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "obs_cents",
        F.last("obs_cents", ignorenulls=True).over(w).alias("filled_cents"),
    ).orderBy("event_id")


SQL_WINDOW_FILL_FORWARD = """
WITH ev AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type != 'view'
              THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END AS obs_cents
  FROM events
)
SELECT event_id, user_id, obs_cents,
       last_value(obs_cents IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_cents
FROM ev
ORDER BY event_id
"""


# --------------------------------------------------------------------
# systematic sampling
# --------------------------------------------------------------------

_SYS_EVERY = 10


def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source systematic sample: every 10th document in
    md5-hash order within each source shard (rank 1, 11, 21, ...).
    Hash order decouples the sample from storage order (a
    storage-ordered systematic sample inherits whatever correlation
    the writer had); per-shard ranking keeps the window partitioned —
    the 100 TB shape samples each shard independently, no global
    sort.

    Returns the sampled documents with their in-shard rank."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|sys42")))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter((F.col("rk") % _SYS_EVERY) == 1)
        .select("doc_id", "source", F.col("rk").cast("long").alias("rk"))
        .orderBy("source", "rk")
    )


SQL_SAMPLE_SYSTEMATIC = f"""
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(doc_id || '|sys42'), doc_id) AS rk
  FROM documents
)
WHERE rk % {_SYS_EVERY} = 1
ORDER BY source, rk
"""


# --------------------------------------------------------------------
# absence streaks
# --------------------------------------------------------------------


def q_events_absence_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest inactivity gap per user — the churn-risk mirror of
    events_streaks' presence runs: per user, the maximum count of
    fully ABSENT days between consecutive active days (consecutive
    active days contribute 0, matching single-active-day users — a
    consistent zero-absence baseline, review r12), rolled into a
    histogram (max_gap_days -> n_users).

    Scale: per-user distinct-day rollup, one per-user lag window over
    bounded partitions, one small groupBy."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_micros(F.col("ts")) / _US_PER_DAY).alias("day"),
    )
    days = ev.distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    gaps = days.select(
        "user_id",
        (F.col("day") - F.lag("day").over(w) - 1).alias("gap"),
    )
    per_user = gaps.groupBy("user_id").agg(
        F.coalesce(F.max("gap"), F.lit(0)).alias("max_gap_days")
    )
    return (
        per_user.groupBy("max_gap_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("max_gap_days")
    )


SQL_EVENTS_ABSENCE_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
gaps AS (
  SELECT user_id,
         day - lag(day) OVER (PARTITION BY user_id ORDER BY day) - 1 AS gap
  FROM days
),
per_user AS (
  SELECT user_id, coalesce(max(gap), 0) AS max_gap_days
  FROM gaps GROUP BY 1
)
SELECT CAST(max_gap_days AS BIGINT) AS max_gap_days,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1
ORDER BY max_gap_days
"""


QUERIES: dict[str, QuerySpec] = {
    "join_asof_forward": QuerySpec(q_join_asof_forward, SQL_JOIN_ASOF_FORWARD),
    "window_fill_forward": QuerySpec(
        q_window_fill_forward, SQL_WINDOW_FILL_FORWARD
    ),
    "sample_systematic": QuerySpec(q_sample_systematic, SQL_SAMPLE_SYSTEMATIC),
    "events_absence_streaks": QuerySpec(
        q_events_absence_streaks, SQL_EVENTS_ABSENCE_STREAKS
    ),
}
