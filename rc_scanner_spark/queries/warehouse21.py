"""Round-7 batch 29: cross-signal corpus calibration and SPC monitoring.

Why these belong in a 100 TB training-data engine:

* ``profile_quality_dup_calibration`` — the joint distribution of the
  quality score and exact-duplication: per quality band, how much of
  the band is duplicated text.  This is the calibration table that
  justifies (or kills) "filter by quality before dedup" orderings: if
  low-quality bands are dup-heavy, dedup-first wins.
* ``events_error_pchart`` — the classic p-chart (proportion control
  chart): per-day error share with 3-sigma binomial control limits
  around the corpus-wide rate.  Complements the MAD
  (events_rate_anomaly / events_threshold_suggest) and CUSUM
  (events_changepoint_cusum) monitors with the textbook SPC form whose
  limits WIDEN for low-volume days instead of over-alarming them.

Engine-parity notes: quality reuses the canonical round-4 score (the
driver-green text_quality chain) so band edges floor identically;
duplication counts are exact integers; the p-chart's per-day limit is
ONE closed-form float chain (identical op order both engines) ppm-
floored before comparison, so the out-of-control flag compares
integers, never raw floats.

Reference scope note: the reference engine (scanner.py:120-175) has no
analytics surface; extends SURVEY.md §2.B's LLM-pipeline / events
categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import LANG_MARKERS, fingerprint, quality_score
from . import QuerySpec, load_tuned
from .llm import sql_quality_ctes

_t = load_tuned
_M = LANG_MARKERS


# --------------------------------------------------------------------
# quality-band x exact-dup calibration
# --------------------------------------------------------------------


def q_profile_quality_dup_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per quality band (0.05-wide, <= 21 bands), the doc count and the
    share of docs whose normalized fingerprint occurs >= 2 times in the
    corpus.

    Scale: one map-side quality+fingerprint projection, one fp hash
    aggregate, one key join back, one bounded-band aggregate — no
    windows, no cartesians."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.floor(quality_score(F.col("text")) * 20).cast("long").alias("band"),
        fingerprint(F.col("text")).alias("fp"),
    )
    fpc = base.groupBy("fp").agg(F.count(F.lit(1)).alias("c"))
    j = base.join(fpc, "fp")
    return (
        j.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            "band",
            "n_docs",
            F.col("n_dup").cast("bigint").alias("n_dup"),
            F.floor(
                F.col("n_dup").cast("double")
                * 1000000.0
                / F.col("n_docs").cast("double")
            )
            .cast("bigint")
            .alias("dup_ppm"),
        )
        .orderBy("band")
    )


# quality gate + fingerprint come from the SHARED llm.sql_quality_ctes
# block (review r7: this chain existed in five copies; now one site)
SQL_PROFILE_QUALITY_DUP_CALIBRATION = f"""
WITH {sql_quality_ctes(with_fp=True)},
base AS (
  SELECT doc_id, CAST(floor(quality * 20) AS BIGINT) AS band, fp FROM q
),
fpc AS (SELECT fp, count(*) AS c FROM base GROUP BY 1)
SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(floor(CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                  * 1000000.0 / CAST(count(*) AS DOUBLE)) AS BIGINT) AS dup_ppm
FROM base JOIN fpc USING (fp)
GROUP BY band ORDER BY band
"""


# --------------------------------------------------------------------
# daily error-share p-chart
# --------------------------------------------------------------------


def q_events_error_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-chart of the daily error share: per day, the error proportion
    (ppm) plus the 3-sigma binomial control limits around the
    corpus-wide rate, sigma_day = sqrt(pbar * (1 - pbar) / n_day), and
    an out-of-control flag.  Limits widen for thin days — the property
    the fixed-threshold monitors lack.

    Scale: one day aggregate (bounded by the calendar), a 1-row totals
    broadcast (pinned cartesian), map-side closed-form limits; the
    flag compares ppm INTEGERS so engine float drift cannot flip it."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_errors"),
    )
    tot = daily.agg(
        F.sum("n_events").alias("nn"), F.sum("n_errors").alias("ee")
    )
    pbar = F.col("ee").cast("double") / F.col("nn").cast("double")
    sigma = F.sqrt(pbar * (1 - pbar) / F.col("n_events").cast("double"))
    p_ppm = F.floor(
        F.col("n_errors").cast("double")
        * 1000000.0
        / F.col("n_events").cast("double")
    ).cast("long")
    ucl_ppm = F.floor((pbar + 3 * sigma) * 1000000.0 + 0.5).cast("long")
    lcl_ppm = F.floor(
        F.greatest(pbar - 3 * sigma, F.lit(0.0)) * 1000000.0 + 0.5
    ).cast("long")
    return (
        daily.crossJoin(F.broadcast(tot))
        .select(
            "day",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_errors").cast("bigint").alias("n_errors"),
            p_ppm.alias("p_ppm"),
            ucl_ppm.alias("ucl_ppm"),
            lcl_ppm.alias("lcl_ppm"),
        )
        .withColumn(
            "out_of_control",
            (
                (F.col("p_ppm") > F.col("ucl_ppm"))
                | (F.col("p_ppm") < F.col("lcl_ppm"))
            ).cast("int"),
        )
        .orderBy("day")
    )


SQL_EVENTS_ERROR_PCHART = """
WITH daily AS (
  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         count(*) AS n_events,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
  FROM events GROUP BY 1
),
tot AS (SELECT sum(n_events) AS nn, sum(n_errors) AS ee FROM daily),
lim AS (
  SELECT day, n_events, n_errors,
         CAST(floor(CAST(n_errors AS DOUBLE) * 1000000.0
                    / CAST(n_events AS DOUBLE)) AS BIGINT) AS p_ppm,
         CAST(floor((CAST(ee AS DOUBLE) / CAST(nn AS DOUBLE)
                     + 3 * sqrt(CAST(ee AS DOUBLE) / CAST(nn AS DOUBLE)
                                * (1 - CAST(ee AS DOUBLE) / CAST(nn AS DOUBLE))
                                / CAST(n_events AS DOUBLE)))
                    * 1000000.0 + 0.5) AS BIGINT) AS ucl_ppm,
         CAST(floor(greatest(CAST(ee AS DOUBLE) / CAST(nn AS DOUBLE)
                             - 3 * sqrt(CAST(ee AS DOUBLE) / CAST(nn AS DOUBLE)
                                        * (1 - CAST(ee AS DOUBLE) / CAST(nn AS DOUBLE))
                                        / CAST(n_events AS DOUBLE)), 0.0)
                    * 1000000.0 + 0.5) AS BIGINT) AS lcl_ppm
  FROM daily, tot
)
SELECT day, CAST(n_events AS BIGINT) AS n_events,
       CAST(n_errors AS BIGINT) AS n_errors,
       p_ppm, ucl_ppm, lcl_ppm,
       CAST(CASE WHEN p_ppm > ucl_ppm OR p_ppm < lcl_ppm
                 THEN 1 ELSE 0 END AS INTEGER) AS out_of_control
FROM lim ORDER BY day
"""


QUERIES: dict[str, QuerySpec] = {
    "profile_quality_dup_calibration": QuerySpec(
        q_profile_quality_dup_calibration, SQL_PROFILE_QUALITY_DUP_CALIBRATION
    ),
    "events_error_pchart": QuerySpec(
        q_events_error_pchart, SQL_EVENTS_ERROR_PCHART
    ),
}
