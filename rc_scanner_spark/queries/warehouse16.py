"""Round-6 batch 24: exact quota apportionment and winsorized
robust means.

Why these belong in a 100 TB training-data engine:

* ``sample_quota_hamilton`` — allocating a fixed sample budget
  across sources proportionally NEVER lands on integers; Hamilton's
  largest-remainder method is the exact apportionment (floor every
  quota, hand the leftover seats to the largest fractional
  remainders) and the reason a 100-doc-per-release quota sums to
  exactly 100.  The allocation runs on the per-source aggregate —
  a frame bounded by source cardinality.
* ``agg_winsorized_mean`` — heavy tails wreck plain means; the 5%
  winsorized mean clamps to the exact p5/p95 per group and averages
  integers.  Percentile cuts use the verified percentile ==
  quantile_cont identity; clamp bounds floor to integer cents FIRST
  so the final mean is an exact integer sum in any accumulation
  order.

Engine-parity notes: remainders compare as exact integer products
(n_docs * K vs quota * total — no float shares anywhere in the
ranking); winsorized sums are integer cents; the only doubles are
the percentile cuts, floored identically before any arithmetic.

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; extends SURVEY.md §2.B's sampling / agg
categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned

_t = load_tuned

_QH_BUDGET = 100


def q_sample_quota_hamilton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of a 100-doc sample
    budget across sources: base = floor(n_i * K / N), the leftover
    seats go to the largest remainders (ties by source name); the
    allocations sum to exactly K.

    Scale: one source-keyed aggregate (bounded by source
    cardinality), one bounded window for the remainder rank, one
    broadcast total.  Remainders rank by the exact integer product
    n_i * K %% N — no float shares."""
    docs = _t(spark, sf_dir, "documents").select("source")
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(F.sum("n_docs").alias("n_total"))
    w = Window.orderBy(F.desc("rem"), "source")
    alloc = (
        per.crossJoin(F.broadcast(tot))
        .withColumn(
            "base", F.expr(f"(n_docs * {_QH_BUDGET}) DIV n_total")
        )
        .withColumn("rem", F.expr(f"(n_docs * {_QH_BUDGET}) % n_total"))
        .withColumn("rk", F.row_number().over(w))
    )
    leftover = F.lit(_QH_BUDGET) - F.sum("base").over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return (
        alloc.withColumn("leftover", leftover)
        .select(
            "source",
            "n_docs",
            "base",
            (F.col("rk") <= F.col("leftover")).cast("int").alias("bonus"),
            (
                F.col("base")
                + (F.col("rk") <= F.col("leftover")).cast("int")
            ).alias("quota"),
        )
        .orderBy("source")
    )


SQL_SAMPLE_QUOTA_HAMILTON = f"""
WITH per AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
),
tot AS (SELECT sum(n_docs) AS n_total FROM per),
alloc AS (
  SELECT p.source, p.n_docs,
         (p.n_docs * {_QH_BUDGET}) // t.n_total AS base,
         (p.n_docs * {_QH_BUDGET}) % t.n_total AS rem,
         row_number() OVER (
           ORDER BY (p.n_docs * {_QH_BUDGET}) % t.n_total DESC, p.source
         ) AS rk
  FROM per p CROSS JOIN tot t
),
lo AS (SELECT {_QH_BUDGET} - sum(base) AS leftover FROM alloc)
SELECT a.source, CAST(a.n_docs AS BIGINT) AS n_docs,
       CAST(a.base AS BIGINT) AS base,
       CAST(CASE WHEN a.rk <= l.leftover THEN 1 ELSE 0 END AS INT)
         AS bonus,
       CAST(a.base + CASE WHEN a.rk <= l.leftover THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM alloc a CROSS JOIN lo l
ORDER BY a.source
"""


def q_agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% winsorized mean of account balance per market segment:
    exact p5/p95 cuts floored to integer cents, balances clamped to
    [lo, hi], then an exact integer mean (milli-cents, truncating
    div).

    Scale: one grouped percentile aggregate joined back broadcast to
    the fact rows (segment-keyed), then one grouped integer sum —
    the clamp happens map-side; sums are exact in any order."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint").alias("xc"),
    )
    cuts = cust.groupBy("c_mktsegment").agg(
        F.floor(F.expr("percentile(xc, 0.05)")).cast("bigint").alias("lo"),
        F.floor(F.expr("percentile(xc, 0.95)")).cast("bigint").alias("hi"),
    )
    clamped = cust.join(F.broadcast(cuts), "c_mktsegment").select(
        "c_mktsegment",
        F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("xc"))).alias(
            "cx"
        ),
    )
    return (
        clamped.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cx").alias("wsum_cents"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            "wsum_cents",
            F.expr("(wsum_cents * 1000) DIV n_customers").alias(
                "winsorized_mean_millicents"
            ),
        )
        .orderBy("c_mktsegment")
    )


SQL_AGG_WINSORIZED_MEAN = """
WITH cust AS (
  SELECT c_mktsegment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS xc
  FROM customer
),
cuts AS (
  SELECT c_mktsegment,
         CAST(floor(quantile_cont(xc, 0.05)) AS BIGINT) AS lo,
         CAST(floor(quantile_cont(xc, 0.95)) AS BIGINT) AS hi
  FROM cust GROUP BY 1
),
clamped AS (
  SELECT c.c_mktsegment,
         greatest(k.lo, least(k.hi, c.xc)) AS cx
  FROM cust c JOIN cuts k ON k.c_mktsegment = c.c_mktsegment
)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cx) AS BIGINT) AS wsum_cents,
       CAST((sum(cx) * 1000) // count(*) AS BIGINT)
         AS winsorized_mean_millicents
FROM clamped GROUP BY 1 ORDER BY c_mktsegment
"""


QUERIES: dict[str, QuerySpec] = {
    "sample_quota_hamilton": QuerySpec(
        q_sample_quota_hamilton, SQL_SAMPLE_QUOTA_HAMILTON
    ),
    "agg_winsorized_mean": QuerySpec(
        q_agg_winsorized_mean, SQL_AGG_WINSORIZED_MEAN
    ),
}
