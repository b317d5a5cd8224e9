"""Round-7 batch 30: nearest as-of joins, script composition, bounce rate.

Why these belong in a 100 TB training-data engine:

* ``join_asof_nearest`` — completes the as-of join family (backward
  ``join_asof``, tolerance-bounded ``join_asof_tolerance``) with the
  nearest-either-direction mode (pandas ``merge_asof(direction=
  'nearest')``): sensor/label alignment where the closest reading
  wins regardless of side.
* ``text_script_mix`` — per-source character-script composition
  (latin/digit/whitespace/CJK/other shares): the first-line corpus
  audit for multilingual mixes and mojibake, orthogonal to the
  stopword-marker language ID.
* ``events_bounce_rate`` — per-day share of single-event sessions on
  the shared 30-minute-gap sessionization: the engagement-health
  counterpart to session counts.

Engine-parity notes: script counts use length-minus-regexp_replace
deltas (no match arrays) with the engine-neutral whitespace class
[ \\t\\n\\x0B\\f\\r]; the nearest tie (equidistant before/after)
resolves to the BACKWARD row then smallest id on both engines; bounce
shares are double-first ppm floors over exact session counts.

Reference scope note: the reference engine (scanner.py:120-175) has no
analytics surface; extends SURVEY.md §2.B's joins / text / events
categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import asof_join, sessionize
from . import QuerySpec, load_tuned
from .relational import SQL_SESSIONIZE_CTE

_t = load_tuned


# --------------------------------------------------------------------
# nearest-direction as-of join
# --------------------------------------------------------------------


def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each purchase paired with the same user's
    CLOSEST click within +-1 hour, either direction; equidistant pairs
    resolve to the earlier (backward) click.  gap_us is signed
    (positive = click preceded the purchase).

    Scale: identical plan shape to join_asof_tolerance — one equi-
    shuffle on user, the two-sided tolerance predicate prunes fan-out
    BEFORE the per-purchase pick window."""
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
        tolerance=F.expr("INTERVAL 1 HOUR"),
        direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        "click_event_id",
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_matched_ts"))
        ).alias("gap_us"),
    )


SQL_JOIN_ASOF_NEAREST = """
-- The pick window partitions by p.event_id, which assumes purchase
-- event_ids are UNIQUE (they are: events.event_id is the table's
-- primary key).  The Spark side partitions per physical left row
-- (monotonically_increasing_id), so with duplicate event_ids the twin
-- would collapse duplicates to one row while Spark keeps one match per
-- row — keep this twin only under the uniqueness invariant (ADVICE r8).
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id AS click_event_id, ts AS click_ts
           FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, c.click_event_id,
       epoch_us(p.ts) - epoch_us(c.click_ts) AS gap_us
FROM p LEFT JOIN c ON c.user_id = p.user_id
                  AND c.click_ts >= p.ts - INTERVAL 1 HOUR
                  AND c.click_ts <= p.ts + INTERVAL 1 HOUR
QUALIFY row_number() OVER (
    PARTITION BY p.event_id
    ORDER BY abs(epoch_us(c.click_ts) - epoch_us(p.ts)) NULLS LAST,
             c.click_ts NULLS LAST,
             c.click_event_id NULLS LAST) = 1
"""


# --------------------------------------------------------------------
# per-source character-script composition
# --------------------------------------------------------------------


def _class_count_translate(chars: str) -> F.Column:
    """Finite-set char-class count: translate is a plain char-map pass,
    no regex engine — the quality_columns idiom (operators/text.py)."""
    return F.length("text") - F.length(F.translate(F.col("text"), chars, ""))


def _class_count(pat: str) -> F.Column:
    return F.length("text") - F.length(F.regexp_replace(F.col("text"), pat, ""))


def q_text_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-script composition: total characters and
    the ppm share of latin letters, digits, whitespace, CJK, and
    everything else.

    Scale: counts are length-minus-replace deltas (one regex pass per
    class, no match-array materialization), summed map-side into one
    source aggregate."""
    import string

    d = _t(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.length("text").cast("long").alias("n"),
        # finite classes count via translate (one char-map pass, no
        # regex engine); only the CJK RANGE needs a regex.  The
        # whitespace set is the engine-neutral explicit list (Java \s
        # vs RE2 \s disagree on U+000B).
        _class_count_translate(string.ascii_letters).cast("long").alias("latin"),
        _class_count_translate(string.digits).cast("long").alias("digit"),
        _class_count_translate(" \t\n\x0B\f\r").cast("long").alias("space"),
        _class_count("[一-鿿]").cast("long").alias("cjk"),
    )
    agg = per_doc.groupBy("source").agg(
        F.sum("n").alias("n_chars"),
        F.sum("latin").alias("latin"),
        F.sum("digit").alias("digit"),
        F.sum("space").alias("space"),
        F.sum("cjk").alias("cjk"),
    )

    def ppm(col: str) -> F.Column:
        return (
            F.floor(
                F.col(col).cast("double")
                * 1000000.0
                / F.col("n_chars").cast("double")
            )
            .cast("bigint")
            .alias(f"{col}_ppm")
        )

    return (
        agg.filter(F.col("n_chars") > 0)
        .select(
            "source",
            "n_chars",
            ppm("latin"),
            ppm("digit"),
            ppm("space"),
            ppm("cjk"),
            F.floor(
                (
                    F.col("n_chars")
                    - F.col("latin")
                    - F.col("digit")
                    - F.col("space")
                    - F.col("cjk")
                ).cast("double")
                * 1000000.0
                / F.col("n_chars").cast("double")
            )
            .cast("bigint")
            .alias("other_ppm"),
        )
        .orderBy("source")
    )


SQL_TEXT_SCRIPT_MIX = """
WITH per_doc AS (
  SELECT source,
         CAST(length(text) AS BIGINT) AS n,
         CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
              AS BIGINT) AS latin,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS digit,
         CAST(length(text) - length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]', '', 'g'))
              AS BIGINT) AS space,
         CAST(length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g'))
              AS BIGINT) AS cjk
  FROM documents
),
agg AS (
  SELECT source, sum(n) AS n_chars, sum(latin) AS latin,
         sum(digit) AS digit, sum(space) AS space, sum(cjk) AS cjk
  FROM per_doc GROUP BY 1 HAVING sum(n) > 0
)
SELECT source, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(floor(CAST(latin AS DOUBLE) * 1000000.0 / CAST(n_chars AS DOUBLE)) AS BIGINT) AS latin_ppm,
       CAST(floor(CAST(digit AS DOUBLE) * 1000000.0 / CAST(n_chars AS DOUBLE)) AS BIGINT) AS digit_ppm,
       CAST(floor(CAST(space AS DOUBLE) * 1000000.0 / CAST(n_chars AS DOUBLE)) AS BIGINT) AS space_ppm,
       CAST(floor(CAST(cjk AS DOUBLE) * 1000000.0 / CAST(n_chars AS DOUBLE)) AS BIGINT) AS cjk_ppm,
       CAST(floor(CAST(n_chars - latin - digit - space - cjk AS DOUBLE)
                  * 1000000.0 / CAST(n_chars AS DOUBLE)) AS BIGINT) AS other_ppm
FROM agg ORDER BY source
"""


# --------------------------------------------------------------------
# daily bounce rate over the shared sessionization
# --------------------------------------------------------------------


def q_events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day bounce rate: the share of 30-minute-gap sessions
    STARTING that day that contain exactly one event.

    Scale: the sessionize window shuffles once on user_id (same key
    cardinality as the session count query it shares the operator
    with); session and day rollups are hash aggregates over session
    rows."""
    ev = _t(spark, sf_dir, "events")
    s = sessionize(
        ev, key="user_id", ts="ts", gap_seconds=1800, order_tiebreak="event_id"
    )
    sessions = s.groupBy(
        "user_id", F.col("session_id").cast("long").alias("session_id")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start_ts"),
    )
    return (
        sessions.groupBy(
            F.date_format("start_ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(
                F.when(F.col("n_events") == 1, 1).otherwise(0)
            ).alias("n_bounce"),
        )
        .select(
            "day",
            "n_sessions",
            F.col("n_bounce").cast("bigint").alias("n_bounce"),
            F.floor(
                F.col("n_bounce").cast("double")
                * 1000000.0
                / F.col("n_sessions").cast("double")
            )
            .cast("bigint")
            .alias("bounce_ppm"),
        )
        .orderBy("day")
    )


SQL_EVENTS_BOUNCE_RATE = f"""
WITH {SQL_SESSIONIZE_CTE},
sessions AS (
  SELECT user_id, session_id, count(*) AS n_events, min(ts) AS start_ts
  FROM s GROUP BY 1, 2
)
SELECT strftime(CAST(start_ts AS TIMESTAMP), '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
       CAST(floor(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                  * 1000000.0 / CAST(count(*) AS DOUBLE)) AS BIGINT) AS bounce_ppm
FROM sessions GROUP BY 1 ORDER BY day
"""


QUERIES: dict[str, QuerySpec] = {
    "join_asof_nearest": QuerySpec(q_join_asof_nearest, SQL_JOIN_ASOF_NEAREST),
    "text_script_mix": QuerySpec(q_text_script_mix, SQL_TEXT_SCRIPT_MIX),
    "events_bounce_rate": QuerySpec(q_events_bounce_rate, SQL_EVENTS_BOUNCE_RATE),
}
