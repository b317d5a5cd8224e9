"""Round-6 batch 20: fulfillment-latency quantiles, vocabulary
coverage curves, and max-drawdown profiling.

Why these belong in a 100 TB training-data engine:

* ``orders_ship_latency_by_priority`` — p50/p90/p99 fulfillment
  latency per priority class is the stock operational SLA rollup;
  exact per-group percentiles ride the engines' shared
  ``percentile`` / ``quantile_cont`` semantics (hash-verified parity
  idiom from the round-5 memory) over integer day latencies.
* ``text_ngram_coverage_curve`` — "what share of corpus token mass
  does a k-token vocabulary cover" is THE tokenizer-sizing curve
  (the knee tells you the vocab budget).  The vocabulary frame is
  token-keyed (vocabulary-sized, not corpus-sized); the curve
  checkpoints join against it with a broadcast k-list.
* ``events_max_drawdown`` — the largest peak-to-trough decline of
  the daily series per type (running max minus current, maximized)
  summarizes worst-case volume collapse in one number — integer
  exact, windows partitioned by type over the bounded day spine.

Engine-parity notes: percentile interpolation follows the verified
Spark ``percentile`` == DuckDB ``quantile_cont`` identity on integer
inputs with results floored to milli-days via the shared
double-first chain; the coverage curve and drawdown are integer
arithmetic end-to-end.

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; these extend SURVEY.md §2.B's warehouse /
text categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned
from .warehouse2 import SQL_DAY_SPINE_CTE

_t = load_tuned


# --------------------------------------------------------------------
# fulfillment latency quantiles per priority
# --------------------------------------------------------------------

_LAT_QS = (0.5, 0.9, 0.99)


def q_orders_ship_latency_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact p50/p90/p99 of ship latency (days from order date to
    line ship date) per order priority.

    Scale: one fact-fact equi-join on the order key (both sides
    shuffle-partition on it), integer day latencies, and a grouped
    exact-percentile aggregate — the group count is the priority
    cardinality.  Interpolated quantiles floor to milli-days through
    the shared double-first chain."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    lat = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).select(
        "o_orderpriority", F.datediff("sd", "od").alias("lat_days")
    )
    agg = lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        *[
            F.expr(f"percentile(lat_days, {q})").alias(f"q{i}")
            for i, q in enumerate(_LAT_QS)
        ],
    )
    cols = [
        F.floor(F.col(f"q{i}") * 1000.0)
        .cast("bigint")
        .alias(f"p{int(q * 100)}_milli_days")
        for i, q in enumerate(_LAT_QS)
    ]
    return agg.select("o_orderpriority", "n_lines", *cols).orderBy(
        "o_orderpriority"
    )


SQL_ORDERS_SHIP_LATENCY_BY_PRIORITY = f"""
WITH lat AS (
  SELECT o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS lat_days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
       {", ".join(
           f"CAST(floor(quantile_cont(lat_days, {q}) * 1000.0) AS BIGINT)"
           f" AS p{int(q * 100)}_milli_days"
           for q in _LAT_QS
       )}
FROM lat GROUP BY 1 ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------
# vocabulary coverage curve (tokenizer sizing)
# --------------------------------------------------------------------

_COV_KS = (1, 2, 4, 8, 16, 32, 64)


def q_text_ngram_coverage_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token-mass coverage of the top-k vocabulary for doubling k
    checkpoints: share (ppm) of all corpus token occurrences covered
    by the k most frequent tokens (ties broken by token).

    Scale: the corpus collapses to the vocabulary-sized (token,
    count) aggregate before any window runs; the rank/cumsum window
    is over THAT frame (vocabulary-sized — the one unpartitioned
    window, bounded by the token-type count, not the corpus); the
    k-checkpoint list is a broadcast literal."""
    toks = _t(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda x: x != F.lit(""),
            )
        ).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.desc("c"), "tok").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = vocab.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("c"), "tok"))
    ).withColumn("cum", F.sum("c").over(w))
    tot = vocab.agg(
        F.sum("c").alias("t_total"), F.count(F.lit(1)).alias("n_vocab")
    )
    ks = spark.createDataFrame(
        [(k,) for k in _COV_KS], "k int"
    )
    at_k = (
        ranked.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(ks),
            F.col("rn") == F.least(F.col("k"), F.col("n_vocab")),
        )
        .select(
            "k",
            F.least(F.col("k"), F.col("n_vocab")).alias("n_vocab_used"),
            # double-first on BOTH sides: cum * 1e6 as BIGINT throws
            # ARITHMETIC_OVERFLOW under ANSI past ~9.2e12 cumulative
            # tokens (review-round fix, r6)
            F.expr(
                "CAST(floor(CAST(cum AS DOUBLE) * 1000000.0"
                " / CAST(t_total AS DOUBLE)) AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )
    return at_k.orderBy("k")


_ks_sql = ", ".join(f"({k})" for k in _COV_KS)

SQL_TEXT_NGRAM_COVERAGE_CURVE = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
),
vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
ranked AS (
  SELECT c,
         row_number() OVER (ORDER BY c DESC, tok) AS rn,
         sum(c) OVER (ORDER BY c DESC, tok
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM vocab
),
tot AS (SELECT sum(c) AS t_total, count(*) AS n_vocab FROM vocab),
ks(k) AS (VALUES {_ks_sql})
SELECT ks.k,
       CAST(least(ks.k, t.n_vocab) AS BIGINT) AS n_vocab_used,
       CAST(floor(CAST(r.cum AS DOUBLE) * 1000000.0
                  / CAST(t.t_total AS DOUBLE)) AS BIGINT) AS coverage_ppm
FROM ks
CROSS JOIN tot t
JOIN ranked r ON r.rn = least(ks.k, t.n_vocab)
ORDER BY ks.k
"""


# --------------------------------------------------------------------
# max drawdown of the daily series
# --------------------------------------------------------------------


def q_events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest peak-to-trough decline of daily event counts per type
    on the zero-filled spine: max over days of (running max - count),
    with the peak value and the trough day it bottomed on (earliest
    such day; ties break on day).

    Scale: events collapse to the bounded (type, day) spine; the
    running max and the argmin pick are per-type windows/aggregates
    — integer exact end-to-end."""
    from .warehouse2 import filled_day_spine

    filled = filled_day_spine(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dd = filled.withColumn("peak", F.max("cnt").over(w)).withColumn(
        "drawdown", F.col("peak") - F.col("cnt")
    )
    # argmax by (drawdown, -epoch_day): deterministic earliest-day
    # winner via the struct-max idiom
    pick = dd.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.col("drawdown"),
                (-F.unix_date(F.col("day"))).alias("negd"),
                F.col("peak"),
            )
        ).alias("s")
    )
    return pick.select(
        "event_type",
        F.col("s.drawdown").alias("max_drawdown"),
        F.col("s.peak").alias("peak_cnt"),
        F.date_format(
            F.date_from_unix_date((-F.col("s.negd")).cast("int")),
            "yyyy-MM-dd",
        ).alias("trough_day"),
    ).orderBy("event_type")


SQL_EVENTS_MAX_DRAWDOWN = "WITH " + SQL_DAY_SPINE_CTE + """,
dd AS (
  SELECT event_type, day, cnt,
         max(cnt) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS peak
  FROM filled
),
pick AS (
  SELECT event_type,
         max({'dd': peak - cnt,
              'negd': -date_diff('day', DATE '1970-01-01', day),
              'peak': peak}) AS s
  FROM dd GROUP BY 1
)
SELECT event_type,
       CAST(s.dd AS BIGINT) AS max_drawdown,
       CAST(s.peak AS BIGINT) AS peak_cnt,
       strftime(DATE '1970-01-01' + CAST(-s.negd AS INT), '%Y-%m-%d')
         AS trough_day
FROM pick ORDER BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "orders_ship_latency_by_priority": QuerySpec(
        q_orders_ship_latency_by_priority, SQL_ORDERS_SHIP_LATENCY_BY_PRIORITY
    ),
    "text_ngram_coverage_curve": QuerySpec(
        q_text_ngram_coverage_curve, SQL_TEXT_NGRAM_COVERAGE_CURVE
    ),
    "events_max_drawdown": QuerySpec(
        q_events_max_drawdown, SQL_EVENTS_MAX_DRAWDOWN
    ),
}
