"""Round-6 batch 27: hapax-legomena ratios and monthly status mix.

Why these belong in a 100 TB training-data engine:

* ``text_hapax_ratio`` — the share of vocabulary occurring exactly
  once (hapax legomena) is the classic productivity/OCR-noise
  signal: natural corpora sit near 40-60%, synthetic or truncated
  vocabularies collapse it.  Two grouped aggregates keyed by
  (source, token) then source — no windows, no joins.
* ``orders_status_mix_by_month`` — the order-status composition per
  month is the stock operations mix report; counts per (month,
  status) with the month share from a window PARTITIONED by month.

Engine-parity notes: pure integer counts; shares are double-first
ppm floors; months key as yyyy-MM strings via the shared
date_format/strftime idiom.

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; extends SURVEY.md §2.B's text / warehouse
categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned

_t = load_tuned


def q_text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hapax-legomena profile: vocabulary size, number of
    once-occurring tokens, and the hapax share of the vocabulary in
    ppm.

    Scale: tokenize-explode map-side, one (source, token) aggregate,
    one source rollup — both hash-partitioned, no windows."""
    toks = _t(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda x: x != F.lit(""),
            )
        ).alias("tok"),
    )
    per_tok = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_tok.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias(
                "n_hapax"
            ),
        )
        .select(
            "source",
            "n_types",
            "n_hapax",
            F.floor(
                F.col("n_hapax").cast("double")
                * 1000000.0
                / F.col("n_types").cast("double")
            )
            .cast("bigint")
            .alias("hapax_ppm"),
        )
        .orderBy("source")
    )


SQL_TEXT_HAPAX_RATIO = """
WITH toks AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
per_tok AS (
  SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2
)
SELECT source, CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(floor(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                  * 1000000.0 / CAST(count(*) AS DOUBLE)) AS BIGINT)
         AS hapax_ppm
FROM per_tok GROUP BY 1 ORDER BY source
"""


def q_orders_status_mix_by_month(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-status composition per month: counts per (month, status)
    and the within-month share in ppm.

    Scale: one grouped aggregate; the share denominator is a window
    PARTITIONED by month over the (month, status) cells — bounded by
    the status cardinality per partition."""
    orders = _t(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_orderstatus",
    )
    cells = orders.groupBy("month", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.partitionBy("month")
    return (
        cells.withColumn("m_total", F.sum("n_orders").over(w))
        .select(
            "month",
            "o_orderstatus",
            "n_orders",
            F.floor(
                F.col("n_orders").cast("double")
                * 1000000.0
                / F.col("m_total").cast("double")
            )
            .cast("bigint")
            .alias("share_ppm"),
        )
        .orderBy("month", "o_orderstatus")
    )


SQL_ORDERS_STATUS_MIX_BY_MONTH = """
WITH cells AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         o_orderstatus, count(*) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT month, o_orderstatus, CAST(n_orders AS BIGINT) AS n_orders,
       CAST(floor(CAST(n_orders AS DOUBLE) * 1000000.0
                  / CAST(sum(n_orders) OVER (PARTITION BY month)
                         AS DOUBLE)) AS BIGINT) AS share_ppm
FROM cells ORDER BY month, o_orderstatus
"""


QUERIES: dict[str, QuerySpec] = {
    "text_hapax_ratio": QuerySpec(q_text_hapax_ratio, SQL_TEXT_HAPAX_RATIO),
    "orders_status_mix_by_month": QuerySpec(
        q_orders_status_mix_by_month, SQL_ORDERS_STATUS_MIX_BY_MONTH
    ),
}
