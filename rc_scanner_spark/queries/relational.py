"""Relational operator inventory (SURVEY.md §2.B): scans, filters,
projections, scalar functions, joins (inner/left/semi/anti/broadcast/
range/as-of), aggregations (hash, distinct, rollup/cube/grouping sets),
windows (ranking/analytic/frames), sort/limit/top-k, set ops,
subqueries, pivot, time windows, sessionization.

Every query is a deliberately shaped Catalyst plan: filters first (so
they push into the parquet scan), dimension sides broadcast, one
shuffle per groupBy/window key.  The oracle SQL twin is written in
DuckDB dialect with identical aliases, rounding and integer types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import asof_join, range_join, sessionize, topk_per_group
from . import QuerySpec, load_tuned


_t = load_tuned


# --- scans / filters / projections / scalar functions ----------------------


def q_filter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 analog (filter_.py:43-47): membership + comparison predicates,
    all pushed into the parquet scan by Catalyst."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        F.col("event_type").isin("click", "purchase")
        & (F.col("value") > 50)
        & (F.col("user_id") % 2 == 0)
    ).select("event_id", "event_type", "user_id", F.round("value", 2).alias("value"))


SQL_FILTER_MEMBERSHIP = """
SELECT event_id, event_type, user_id, round(value, 2) AS value
FROM events
WHERE event_type IN ('click', 'purchase') AND value > 50 AND user_id % 2 = 0
"""


def q_filter_null_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 with the threshold disabled: NULL max_edits passes everything
    (filter_.py:88 NULL-disables semantics)."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    mx = F.lit(None).cast("long")
    return counts.filter(mx.isNull() | (F.col("n_events") <= mx))


SQL_FILTER_NULL_THRESHOLD = """
WITH c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
SELECT user_id, n_events FROM c
WHERE CAST(NULL AS BIGINT) IS NULL OR n_events <= CAST(NULL AS BIGINT)
"""


def q_filter_threshold_inclusive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 with an active threshold: **inclusive** <= (filter_.py:88,
    despite the '>' in the skip message at scanner.py:133-134)."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    mx = F.lit(60).cast("long")
    return counts.filter(mx.isNull() | (F.col("n_events") <= mx))


SQL_FILTER_THRESHOLD_INCLUSIVE = """
WITH c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
SELECT user_id, n_events FROM c WHERE 60 IS NULL OR n_events <= 60
"""


def q_proj_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions (P1/P5 family: concat, substring,
    translate, upper/lower, length)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.col("c_mktsegment")).alias("seg_upper"),
        F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
        F.translate(F.col("c_name"), "#", ":").alias("name_colon"),
        F.length(F.col("c_name")).cast("int").alias("name_len"),
        F.concat_ws("_", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
    )


SQL_PROJ_STRING = """
SELECT c_custkey,
       upper(c_mktsegment) AS seg_upper,
       substring(c_name, 1, 8) AS name_prefix,
       translate(c_name, '#', ':') AS name_colon,
       CAST(length(c_name) AS INTEGER) AS name_len,
       c_mktsegment || '_' || CAST(c_custkey AS VARCHAR) AS seg_key
FROM customer
"""


def q_proj_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions: extract, trunc, datediff."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("o_day"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_98"),
    )


SQL_PROJ_DATETIME = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(month(o_orderdate) AS INTEGER) AS o_month,
       CAST(day(o_orderdate) AS INTEGER) AS o_day,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT)
           AS days_to_98
FROM orders
"""


def q_proj_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions on the fact table."""
    l = _t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        # floor(x*100+0.5)/100 instead of round(x, 2): both engines
        # evaluate it on the identical IEEE double, so half-way cases
        # can't diverge (round()'s decimal-vs-binary tie handling does).
        (
            F.floor(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
                + 0.5
            )
            / 100
        ).alias("charge"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod"),
    )


SQL_PROJ_MATH = """
SELECT l_orderkey, l_linenumber,
       floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100
           AS charge,
       round(abs(l_discount - 0.05), 4) AS disc_dev,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod
FROM lineitem
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over the events.props JSON-string column."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    ).filter(F.col("k") > 50)


SQL_JSON_EXTRACT = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
"""


def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding via Spark 4's VARIANT type:
    ``parse_json`` once, then typed ``variant_get`` paths — the
    engine-native way to query heterogeneous JSON at scale (parse cost
    paid once per row; shredded columns stay columnar downstream,
    unlike repeated ``get_json_object`` string re-parses).  Aggregated
    per event_type so the oracle checks both extraction and typing."""
    ev = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


SQL_VARIANT_SHRED = """
SELECT event_type,
       count(CAST(props->>'$.k' AS INTEGER)) AS n_with_k,
       CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
       max(CAST(props->>'$.k' AS INTEGER)) AS max_k
FROM events GROUP BY event_type
"""


def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: extract, distinct, sort, slice,
    join — the engine-side form of the reference's list handling."""
    d = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), " ").alias(
            "first3"
        ),
    )


SQL_ARRAY_OPS = """
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
       array_to_string((list_sort(list_distinct(toks)))[1:3], ' ') AS first3
FROM w
"""


def q_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions: literal map lookup (the reference's API-endpoint
    routing dict, filter_.py:57 / scanner.py:128, as create_map +
    element_at)."""
    ev = _t(spark, sf_dir, "events")
    verb_map = F.create_map(
        F.lit("click"), F.lit("clicked"),
        F.lit("purchase"), F.lit("purchased"),
        F.lit("error"), F.lit("errored"),
        F.lit("signup"), F.lit("signed up"),
        F.lit("view"), F.lit("viewed"),
    )
    return (
        ev.withColumn("verb", F.element_at(verb_map, F.col("event_type")))
        .groupBy("verb")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_MAP_LOOKUP = """
SELECT CASE event_type
         WHEN 'click' THEN 'clicked'
         WHEN 'purchase' THEN 'purchased'
         WHEN 'error' THEN 'errored'
         WHEN 'signup' THEN 'signed up'
         WHEN 'view' THEN 'viewed'
       END AS verb,
       count(*) AS n
FROM events GROUP BY 1
"""


# --- joins ------------------------------------------------------------------


def q_join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join + aggregation.  customer is the small
    side (broadcast); orders/lineitem equi-join shuffles on the order
    key once."""
    # customer grows linearly with scale factor (unlike region/nation),
    # so it carries no broadcast hint: AQE size-gates the strategy and
    # falls back to sort-merge at 100 TB instead of a forced-hint OOM.
    # (Same policy in every TPC-H shape across relational3/4/5.)
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-01-01")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-01-15")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .agg(
            # Per-item integer cents, then an exact bigint sum: a raw
            # double sum + round(., 2) hits cent-tie boundaries once
            # the group count grows (first seen at sf0.1 — thousands
            # of output groups, engine-dependent summation order).
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 100
                        + 0.5
                    ).cast("long")
                )
                / 100.0
            ).alias("revenue")
        )
    )


SQL_JOIN_INNER_AGG = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) / 100.0 AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-01-01'
  AND l_shipdate > TIMESTAMP '1996-01-15'
GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
"""


def q_join_left_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


SQL_JOIN_LEFT_COUNT = """
SELECT c_custkey, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with a >450k order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


SQL_JOIN_SEMI = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the F3 dedup shape
    (filter_.py:90-102): customers with no large (>400k) order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


SQL_JOIN_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def q_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with two broadcast dimensions: the fact table never
    shuffles for the joins (only for the final groupBy)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.countDistinct("s_nationkey").alias("n_supp_nations"),
        )
    )


SQL_JOIN_BROADCAST_DIMS = """
SELECT p_brand, count(*) AS n_items,
       round(avg(l_extendedprice), 2) AS avg_price,
       count(DISTINCT s_nationkey) AS n_supp_nations
FROM lineitem JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand
"""


def q_join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join: facts against [lo, hi) value bands.  The
    band table is broadcast — no fact shuffle (operators/relational.py
    range_join)."""
    ev = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(0.0, 5.0, "tiny"), (5.0, 20.0, "small"), (20.0, 60.0, "mid"), (60.0, 1e9, "large")],
        "lo double, hi double, band string",
    )
    joined = range_join(ev, bands, F.col("value"), F.col("lo"), F.col("hi"))
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


SQL_JOIN_RANGE_BANDS = """
SELECT band, count(*) AS n, round(sum(value), 2) AS total_value
FROM events
JOIN (VALUES (0.0, 5.0, 'tiny'), (5.0, 20.0, 'small'),
             (20.0, 60.0, 'mid'), (60.0, 1e9, 'large')) AS bands(lo, hi, band)
  ON value >= lo AND value < hi
GROUP BY band
"""


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase paired with the same user's
    latest prior click (operators/relational.py asof_join — equi-join
    on the key + per-row latest pick; Spark has no native as-of)."""
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
    )
    # asof_join keys the right side on the renamed key column; align:
    return out.select(
        "event_id",
        "user_id",
        "click_event_id",
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_matched_ts"))
        ).alias("gap_us"),
    )


SQL_JOIN_ASOF = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id AS click_event_id, ts AS click_ts
           FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, c.click_event_id,
       epoch_us(p.ts) - epoch_us(c.click_ts) AS gap_us
FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.click_ts <= p.ts
QUALIFY row_number() OVER (PARTITION BY p.event_id
                           ORDER BY c.click_ts DESC NULLS LAST,
                                    c.click_event_id DESC NULLS LAST) = 1
"""


# --- aggregations -----------------------------------------------------------


def q_agg_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical hash aggregate (partial+final combine is
    automatic in Spark — one shuffle on the two group keys)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    # Money sums go through per-item integer cents -> exact bigint
    # sums: a raw double sum + round(., 2) crosses cent-tie boundaries
    # once groups are large (engine-dependent summation order; the
    # join_inner_agg sf0.1 incident).
    def cents_sum(col):
        return F.sum(F.floor(col * 100 + 0.5).cast("long")) / 100.0

    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            cents_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            cents_sum(disc_price).alias("sum_disc_price"),
            cents_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_AGG_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0
           AS sum_base_price,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) / 100.0 AS sum_disc_price,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                      * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expands to a two-phase aggregate in Spark."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_AGG_DISTINCT = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
FROM events GROUP BY event_type
"""


def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approx distinct with a bounded-error oracle: sketch
    internals differ across engines, so instead of emitting the raw
    estimate (never hash-comparable) the query emits the exact count
    plus a within-5%-of-exact boolean computed from the HLL estimate
    (rsd 0.02 -> measured error is ~1% at every SF).  Both columns are
    deterministic, so the DuckDB twin (exact count, literal TRUE)
    hash-matches and the driver records a full row — the approximate
    aggregate is still exercised because ``approx_ok`` depends on it."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("a"),
            F.countDistinct("l_partkey").alias("e"),
        )
        .select(
            "l_returnflag",
            F.col("e").alias("exact_parts"),
            # ~5 sigma of the rsd=0.02 sketch (0.05 was only ~2.5
            # sigma — a percent-level tripwire on regenerated data)
            (F.abs(F.col("a") - F.col("e")) / F.col("e") <= 0.10).alias("approx_ok"),
        )
    )


SQL_AGG_APPROX_DISTINCT = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
       TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag
"""


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (avg/stddev/min/max)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


SQL_AGG_STATS = """
SELECT event_type,
       round(avg(value), 4) AS avg_value,
       round(stddev_samp(value), 4) AS sd_value,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value
FROM events GROUP BY event_type
"""


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region -> nation hierarchy (customer counts)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
        )
    )


SQL_AGG_ROLLUP = """
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two flags with a summed measure."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
        )
    )


SQL_AGG_CUBE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (via Spark SQL — same Catalyst plan as the
    DataFrame rollup/cube forms)."""
    d = _t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("gs_documents")
    return spark.sql(
        """
        SELECT coalesce(lang, 'ALL') AS lang,
               coalesce(source, 'ALL') AS source,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM gs_documents
        GROUP BY GROUPING SETS ((lang, source), (lang), ())
        """
    )


SQL_AGG_GROUPING_SETS = """
SELECT coalesce(lang, 'ALL') AS lang,
       coalesce(source, 'ALL') AS source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY GROUPING SETS ((lang, source), (lang), ())
"""


# --- windows ----------------------------------------------------------------


def q_window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — ranking window + filter (single
    shuffle on the partition key; operators/relational.py)."""
    o = _t(spark, sf_dir, "orders")
    out = topk_per_group(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total"),
        F.col("rank").cast("int").alias("rank"),
    )


SQL_WINDOW_RANK_TOPK = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank
FROM orders
QUALIFY rank <= 3
"""


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate per key — rows-frame window."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


SQL_WINDOW_RUNNING_SUM = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_value
FROM events
"""


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: inter-event gaps per user in microseconds."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("prev_gap_us"),
        (F.lead(us).over(w) - us).alias("next_gap_us"),
    )


SQL_WINDOW_LAG_LEAD = """
SELECT event_id, user_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS prev_gap_us,
       lead(epoch_us(ts)) OVER w - epoch_us(ts) AS next_gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartiles of account balance — EXACT ntile semantics with
    no global window (a bare ``ntile(4) OVER (ORDER BY ...)`` is a
    single-reducer sort of the whole table).

    Distributed form: the global rank of (c_acctbal, c_custkey)
    decomposes into
      rank = (#rows in strictly-smaller balance *chunks*)           [c]
           + (#rows in smaller balances within my chunk, exclusive)  [b]
           + (my row_number among equal balances, by custkey)        [a]
    [a] is a window partitioned by balance (distributed), [b] a window
    partitioned by coarse value chunk (distributed; TPC-H balances
    span a fixed domain so chunks are balanced by construction), and
    [c] a triangular join over the ~dozen chunk totals (broadcast).
    The ntile bucket is then pure arithmetic on (rank, n).  Every
    shuffle key is the balance value — nearly unique — so no skew, and
    nothing ever funnels through one reducer."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    w_val = Window.partitionBy("c_acctbal").orderBy("c_custkey")
    ranked = c.withColumn("rk_in_val", F.row_number().over(w_val))
    val_cnt = c.groupBy("c_acctbal").agg(F.count(F.lit(1)).alias("vc"))
    val_cnt = val_cnt.withColumn("chunk", F.floor(F.col("c_acctbal") / 1000))
    w_chunk = Window.partitionBy("chunk").orderBy("c_acctbal")
    cum = val_cnt.withColumn("cum_in_chunk", F.sum("vc").over(w_chunk))
    chunk_tot = val_cnt.groupBy("chunk").agg(F.sum("vc").alias("ct"))
    a, b = chunk_tot.alias("a"), chunk_tot.alias("b")
    prior = (
        a.join(F.broadcast(b), F.col("b.chunk") < F.col("a.chunk"), "left")
        .groupBy(F.col("a.chunk").alias("chunk"))
        .agg(F.coalesce(F.sum("b.ct"), F.lit(0)).alias("prior"))
    )
    offsets = cum.join(prior, "chunk").select(
        "c_acctbal",
        (F.col("prior") + F.col("cum_in_chunk") - F.col("vc")).alias("before"),
    )
    n_total = c.groupBy().agg(F.count(F.lit(1)).alias("n"))
    out = (
        ranked.join(offsets, "c_acctbal")
        .crossJoin(F.broadcast(n_total))
        .withColumn("rank", F.col("before") + F.col("rk_in_val"))
    )
    # ntile(k): the first (n mod k) buckets get ceil(n/k) rows, the
    # rest floor(n/k); for n < k bucket == rank.
    base = F.floor(F.col("n") / 4)
    rem = F.col("n") % 4
    big = base + 1
    cutoff = rem * big
    quartile = F.when(F.col("rank") <= cutoff, F.ceil(F.col("rank") / big)).otherwise(
        rem
        + F.ceil((F.col("rank") - cutoff) / F.greatest(base, F.lit(1)))
    )
    return out.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        quartile.cast("int").alias("quartile"),
    )


SQL_WINDOW_NTILE = """
SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
       CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile
FROM customer
"""


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: count of same-customer orders within +-30 days."""
    o = _t(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.cast("long"))
        .rangeBetween(-30, 30)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("orders_within_30d"),
    )


SQL_WINDOW_RANGE_FRAME = """
SELECT o_orderkey, o_custkey,
       count(*) OVER (PARTITION BY o_custkey
                      ORDER BY date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                      RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING)
           AS orders_within_30d
FROM orders
"""


# --- sort / limit / set ops / pivot / subqueries ---------------------------


def q_sort_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject — no full sort, a per-
    partition heap + driver merge.  Total order (unique tiebreakers)
    makes the result set deterministic."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(50)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


SQL_SORT_TOPK_GLOBAL = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 50
"""


def q_setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


SQL_SETOP_UNION = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


SQL_SETOP_INTERSECT = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (distinct) semantics


SQL_SETOP_EXCEPT = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts into one column per event type."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "purchase", "view", "error", "signup"]
    p = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )


SQL_PIVOT = """
SELECT user_id,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup
FROM events GROUP BY user_id
"""


def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated by Catalyst into a
    join under the hood)."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS total
        FROM sq_orders o
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice)
                                    FROM sq_orders o2
                                    WHERE o2.o_custkey = o.o_custkey)
        """
    )


SQL_CORRELATED_SUBQUERY = """
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders o
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice)
                            FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey)
"""


# --- event-time operators (batch twins of the streaming path) --------------


def q_time_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window via F.window — identical semantics
    to the streaming groupBy(window(...)) (streaming/pipeline.py)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


SQL_TIME_WINDOW_TUMBLING = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min gap): lag + cumulative sum
    (operators/relational.py sessionize); streaming twin is
    session_window."""
    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, order_tiebreak="event_id")
    return s.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# Shared 30-minute-gap sessionization CTE — the DuckDB twin of
# operators/relational.sessionize(gap_seconds=1800, tiebreak event_id).
# Reused by SQL_SESSION_WINDOWS here and warehouse22's bounce rate so
# a gap-rule change edits ONE block (the warehouse2._SQL_EDGES_CTE
# convention); ``s`` exposes (user_id, value, ts, session_id).
SQL_SESSIONIZE_CTE = """g AS (
  SELECT user_id, event_id, value, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, value, ts,
         CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
  FROM g
)"""

SQL_SESSION_WINDOWS = f"""
WITH {SQL_SESSIONIZE_CTE}
SELECT user_id, session_id, count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, session_id
"""


QUERIES: dict[str, QuerySpec] = {
    "filter_membership": QuerySpec(q_filter_membership, SQL_FILTER_MEMBERSHIP),
    "filter_null_threshold": QuerySpec(q_filter_null_threshold, SQL_FILTER_NULL_THRESHOLD),
    "filter_threshold_inclusive": QuerySpec(
        q_filter_threshold_inclusive, SQL_FILTER_THRESHOLD_INCLUSIVE
    ),
    "proj_string": QuerySpec(q_proj_string, SQL_PROJ_STRING),
    "proj_datetime": QuerySpec(q_proj_datetime, SQL_PROJ_DATETIME),
    "proj_math": QuerySpec(q_proj_math, SQL_PROJ_MATH),
    "json_extract": QuerySpec(q_json_extract, SQL_JSON_EXTRACT),
    "variant_shred": QuerySpec(q_variant_shred, SQL_VARIANT_SHRED),
    "array_ops": QuerySpec(q_array_ops, SQL_ARRAY_OPS),
    "map_lookup": QuerySpec(q_map_lookup, SQL_MAP_LOOKUP),
    "join_inner_agg": QuerySpec(q_join_inner_agg, SQL_JOIN_INNER_AGG),
    "join_left_count": QuerySpec(q_join_left_count, SQL_JOIN_LEFT_COUNT),
    "join_semi": QuerySpec(q_join_semi, SQL_JOIN_SEMI),
    "join_anti": QuerySpec(q_join_anti, SQL_JOIN_ANTI),
    "join_broadcast_dims": QuerySpec(q_join_broadcast_dims, SQL_JOIN_BROADCAST_DIMS),
    "join_range_bands": QuerySpec(q_join_range_bands, SQL_JOIN_RANGE_BANDS),
    "join_asof": QuerySpec(q_join_asof, SQL_JOIN_ASOF),
    "agg_tpch_q1": QuerySpec(q_agg_tpch_q1, SQL_AGG_TPCH_Q1),
    "agg_distinct": QuerySpec(q_agg_distinct, SQL_AGG_DISTINCT),
    "agg_approx_distinct": QuerySpec(q_agg_approx_distinct, SQL_AGG_APPROX_DISTINCT),
    "agg_stats": QuerySpec(q_agg_stats, SQL_AGG_STATS),
    "agg_rollup": QuerySpec(q_agg_rollup, SQL_AGG_ROLLUP),
    "agg_cube": QuerySpec(q_agg_cube, SQL_AGG_CUBE),
    "agg_grouping_sets": QuerySpec(q_agg_grouping_sets, SQL_AGG_GROUPING_SETS),
    "window_rank_topk": QuerySpec(q_window_rank_topk, SQL_WINDOW_RANK_TOPK),
    "window_running_sum": QuerySpec(q_window_running_sum, SQL_WINDOW_RUNNING_SUM),
    "window_lag_lead": QuerySpec(q_window_lag_lead, SQL_WINDOW_LAG_LEAD),
    "window_ntile": QuerySpec(q_window_ntile, SQL_WINDOW_NTILE),
    "window_range_frame": QuerySpec(q_window_range_frame, SQL_WINDOW_RANGE_FRAME),
    "sort_topk_global": QuerySpec(q_sort_topk_global, SQL_SORT_TOPK_GLOBAL),
    "setop_union": QuerySpec(q_setop_union, SQL_SETOP_UNION),
    "setop_intersect": QuerySpec(q_setop_intersect, SQL_SETOP_INTERSECT),
    "setop_except": QuerySpec(q_setop_except, SQL_SETOP_EXCEPT),
    "pivot": QuerySpec(q_pivot, SQL_PIVOT),
    "correlated_subquery": QuerySpec(q_correlated_subquery, SQL_CORRELATED_SUBQUERY),
    "time_window_tumbling": QuerySpec(q_time_window_tumbling, SQL_TIME_WINDOW_TUMBLING),
    "session_windows": QuerySpec(q_session_windows, SQL_SESSION_WINDOWS),
}
