"""Round-6 batch 25: character-entropy quality scoring and robust
alert-threshold suggestion.

Why these belong in a 100 TB training-data engine:

* ``text_char_entropy`` — character-level Shannon entropy separates
  natural text (~4 bits/char) from base64/hex blobs (>5) and
  repeated-padding junk (<2); it complements the zlib
  compression-ratio signal without a UDF.  The per-(doc, char) term
  c*ln(c) quantizes to integer NANO units BEFORE the per-doc sum —
  float aggregate sums are accumulation-order-dependent across
  engines (the orders_survival_km lesson), integer sums are exact in
  any order; only the final closed-form chain is double, with ln(2)
  embedded as a Python-precomputed literal on both sides.
* ``events_threshold_suggest`` — the standard robust alerting recipe
  (threshold = p99 + 3 * MAD) per metric stream, composed from the
  verified exact-percentile parity and one broadcast median
  join-back.  This is the op that turns the anomaly family's
  statistics into an actionable config.

Engine-parity notes: [\\s\\S] matches every character on BOTH
engines regardless of their \\s disagreement (the union covers the
alphabet); entropy and thresholds floor doubles built from exact
integers through identical literal chains.

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; extends SURVEY.md §2.B's text / warehouse
categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned

_t = load_tuned

_LN2 = "0.6931471805599453"  # ln(2), Python-precomputed literal


def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy in milli-bits:
    H = (N*ln(N) - sum_c c*ln(c)) / (N*ln(2)) over character counts.

    Scale: one char explode + two doc-keyed aggregates — everything
    partitions by doc_id; the c*ln(c) terms quantize to integer nano
    units before summing (order-independent), and the closed-form
    entropy chain is the identical literal on both engines."""
    chars = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(r"[\s\S]"), F.lit(0))
        ).alias("ch"),
    )
    per_char = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    terms = per_char.select(
        "doc_id",
        "ch",
        "c",
        F.floor(
            F.col("c").cast("double")
            * F.log(F.col("c").cast("double"))
            * 1000000000.0
        )
        .cast("bigint")
        .alias("term_nano"),
    )
    agg = terms.groupBy("doc_id").agg(
        F.sum("c").alias("n_chars_total"),
        F.countDistinct("ch").alias("n_distinct_chars"),
        F.sum("term_nano").alias("sum_nano"),
    )
    nd = F.col("n_chars_total").cast("double")
    ent = F.floor(
        (nd * F.log(nd) - F.col("sum_nano").cast("double") / 1000000000.0)
        / (nd * float(_LN2))
        * 1000.0
    ).cast("bigint")
    return agg.select(
        "doc_id",
        "n_chars_total",
        "n_distinct_chars",
        F.when(F.col("n_chars_total") > 0, ent).alias(
            "entropy_millibits"
        ),
    ).orderBy("doc_id")


SQL_TEXT_CHAR_ENTROPY = f"""
WITH chars AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[\\s\\S]')) AS ch
  FROM documents
),
per_char AS (
  SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2
),
terms AS (
  SELECT doc_id, ch, c,
         CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                    * 1000000000.0) AS BIGINT) AS term_nano
  FROM per_char
),
agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars_total,
         CAST(count(DISTINCT ch) AS BIGINT) AS n_distinct_chars,
         CAST(sum(term_nano) AS BIGINT) AS sum_nano
  FROM terms GROUP BY 1
)
SELECT doc_id, n_chars_total, n_distinct_chars,
       CASE WHEN n_chars_total > 0 THEN
         CAST(floor(
           (CAST(n_chars_total AS DOUBLE) * ln(CAST(n_chars_total AS DOUBLE))
            - CAST(sum_nano AS DOUBLE) / 1000000000.0)
           / (CAST(n_chars_total AS DOUBLE) * {_LN2})
           * 1000.0) AS BIGINT)
       END AS entropy_millibits
FROM agg ORDER BY doc_id
"""


def q_events_threshold_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust alert-threshold suggestion per event type: threshold =
    p99 + 3 * MAD of the metric value (the standard recipe that
    survives heavy tails where mean + k*sigma does not).

    Scale: two grouped exact-percentile aggregates (median, then the
    MAD over deviations via one broadcast median join-back) plus the
    p99; group count = event-type cardinality."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(d, 0.5)").alias("mad")
    )
    p99 = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )
    return (
        p99.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "n_events",
            F.floor(F.col("p99") * 1000.0).cast("bigint").alias(
                "p99_milli"
            ),
            F.floor(F.col("mad") * 1000.0).cast("bigint").alias(
                "mad_milli"
            ),
            F.floor((F.col("p99") + 3.0 * F.col("mad")) * 1000.0)
            .cast("bigint")
            .alias("threshold_milli"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_THRESHOLD_SUGGEST = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
),
mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m ON m.event_type = e.event_type
  GROUP BY 1
),
p99 AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         quantile_cont(value, 0.99) AS p99
  FROM events GROUP BY 1
)
SELECT p.event_type, p.n_events,
       CAST(floor(p.p99 * 1000.0) AS BIGINT) AS p99_milli,
       CAST(floor(m.mad * 1000.0) AS BIGINT) AS mad_milli,
       CAST(floor((p.p99 + 3.0 * m.mad) * 1000.0) AS BIGINT)
         AS threshold_milli
FROM p99 p JOIN mad m ON m.event_type = p.event_type
ORDER BY p.event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "text_char_entropy": QuerySpec(
        q_text_char_entropy, SQL_TEXT_CHAR_ENTROPY
    ),
    "events_threshold_suggest": QuerySpec(
        q_events_threshold_suggest, SQL_EVENTS_THRESHOLD_SUGGEST
    ),
}
