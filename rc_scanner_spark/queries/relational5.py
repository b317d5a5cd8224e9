"""Relational batch 5: the remaining classic TPC-H query shapes the
simplified schemas can express — Q8 (market share, two roles for one
dimension), Q9 (profit by nation x year), Q13 (outer-join count
distribution with a join-time predicate), Q16 (distinct-count stats
over a derived relationship).

Scale notes: every dimension side (region/nation/supplier/part) is
broadcast, so the fact scan shuffles only for fact-fact joins on
their natural keys and the final aggregates.  Q13 pre-aggregates
orders to one row per customer BEFORE its outer join — at 100 TB the
join moves per-key counts, not raw order rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned


_t = load_tuned


# --- Q8: national market share (one dim table in two join roles) -----


def q_tpch_q8ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of STANDARD-part revenue sold
    to AMERICA customers, per order year.  ``nation`` joins twice under
    different roles (supplier nation for the share numerator, customer
    nation for the region restriction); both copies broadcast.  The
    share is a conditional-sum / sum ratio inside one aggregate — no
    second pass over the join."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_cust = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = (
        _t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "AMERICA")
        .select("r_regionkey")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_TPCH_Q8ISH = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(CASE WHEN n1.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
       count(*) AS n_items
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
GROUP BY 1
"""


# --- Q9: product-type profit by nation x year ------------------------


def q_tpch_q9ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp in the simplified schema, so net
    amount is price x (1-disc) x (1-tax) instead of minus supplycost):
    profit on widget-named parts per supplier nation per ship year.
    part/supplier/nation broadcast; the lineitem scan is the only big
    input and it aggregates straight down to |nations| x |years|."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    l = _t(spark, sf_dir, "lineitem")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 - F.col("l_tax"))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(
            # per-item integer cents -> exact bigint sum (the
            # join_inner_agg sf0.1 cent-tie incident)
            (
                F.sum(F.floor(amount * 100 + 0.5).cast("long")) / 100.0
            ).alias("sum_profit")
        )
    )


SQL_TPCH_Q9ISH = """
SELECT n_name AS nation,
       CAST(year(l_shipdate) AS INTEGER) AS o_year,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 - l_tax)
                      * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# --- Q13: customer order-count distribution (outer join + 2 aggs) ----


def q_tpch_q13ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many
    non-urgent orders they placed, INCLUDING zero-order customers —
    the predicate lives on the join input, not a post-filter, so
    filtered-out customers still appear with count 0.  Orders
    pre-aggregate to one row per customer before the outer join
    (at scale: the join moves counts, not order rows); the second
    aggregate is over |customers| rows only."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select(F.coalesce("cnt", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


SQL_TPCH_Q13ISH = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT coalesce(cnt, 0) AS c_count
  FROM customer
  LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders
             WHERE o_orderpriority <> '1-URGENT'
             GROUP BY o_custkey) o
    ON c_custkey = o_custkey
) d
GROUP BY c_count
"""


# --- Q16: supplier-count stats over the derived part-supplier rel ----


def q_tpch_q16ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (no partsupp table: the part-supplier
    relationship derives from lineitem): distinct suppliers per
    (brand, type, size) for non-Brand#13 parts of small sizes.
    The distinct is over (partkey, suppkey) pairs — lineitem
    collapses by orders of magnitude before the distinct-count
    shuffle, and part broadcasts into the pair scan."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 2, 3, 4, 5)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_TPCH_Q16ISH = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_size IN (1, 2, 3, 4, 5)
GROUP BY p_brand, p_type, p_size
"""


# --- bivariate statistics: corr / covariance --------------------------


def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate aggregates per return flag: Pearson correlation and
    population covariance of quantity vs discounted price.  Single
    partial+final hash-agg pass — corr/covar carry (n, sum_x, sum_y,
    sum_xy, ...) moments map-side, so the shuffle moves one moment
    tuple per (flag, partition) regardless of fact size."""
    l = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag").agg(
        F.round(F.corr(F.col("l_quantity"), price), 4).alias("corr_qty_price"),
        F.round(F.covar_pop(F.col("l_quantity"), price), 2).alias("covar_qty_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_AGG_CORR = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice * (1 - l_discount)), 4)
         AS corr_qty_price,
       round(covar_pop(l_quantity, l_extendedprice * (1 - l_discount)), 2)
         AS covar_qty_price,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


# --- ordered string aggregation (collect_list / string_agg) -----------


def q_agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: per region, the comma-joined sorted
    list of its nation names plus the nation count.  collect_list is
    unordered across partitions by design, so the deterministic form
    is collect -> array_sort -> concat_ws (exact string output, no
    float hazard); region/nation are tiny, the groupBy is the only
    exchange."""
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    n = _t(spark, sf_dir, "nation").select("n_regionkey", "n_name")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


SQL_AGG_STRING_COLLECT = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data profiling over the events table: one aggregate
    computes every column's null count, distinct count, and min/max
    (strings via cast), then the 1-row result is unpivoted with stack —
    so profiling N columns costs one scan + one partial-aggregating
    shuffle, never N scans.  The stack runs on a single-row frame, so
    the 'unpivot' is free."""
    e = _t(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        # min/max run on the NATIVE column (string min/max would be
        # lexicographic — '99.99' > '560.21'); only the RESULT is
        # formatted, with engine-stable renderings: second-truncated
        # timestamps and fixed-point printf for doubles.
        def fmt(col, c=c):
            if c == "ts":
                return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
            if c == "value":
                return F.format_string("%.6f", col)
            return col.cast("string")

        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            fmt(F.min(F.col(c))).alias(f"{c}__min"),
            fmt(F.max(F.col(c))).alias(f"{c}__max"),
        ]
    one = e.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return one.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack_args}) as "
            "(column_name, n_nulls, n_distinct, min_str, max_str)"
        ),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")


_PROFILE_COL_SQL = """
SELECT '{c}' AS column_name,
       (SELECT count(*) FROM events) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {smin} AS min_str,
       {smax} AS max_str
FROM events
"""


def _profile_fmt(c: str, inner: str) -> str:
    if c == "ts":
        return f"strftime({inner}, '%Y-%m-%d %H:%M:%S')"
    if c == "value":
        return f"printf('%.6f', {inner})"
    return f"CAST({inner} AS VARCHAR)"


SQL_PROFILE_COLUMNS = " UNION ALL ".join(
    _PROFILE_COL_SQL.format(
        c=c,
        smin=_profile_fmt(c, f"min({c})"),
        smax=_profile_fmt(c, f"max({c})"),
    )
    for c in ("event_id", "ts", "user_id", "event_type", "value")
)


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel with a 1-hour conversion window
    per hop: running per-user windows compute the earliest qualifying
    timestamp of each stage given the previous stage already happened
    (strictly ordered by (ts, event_id)), then one aggregate counts
    users by deepest stage reached.  All three stage windows share the
    user_id partitioning — a single shuffle, reused across the whole
    funnel."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hop = F.expr("INTERVAL 1 HOUR")
    t = e.select("user_id", "ts", "event_id", "event_type")
    t = t.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    t = t.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("t1"))
                & (F.col("ts") <= F.col("t1") + hop),
                F.col("ts"),
            )
        ).over(w),
    )
    t = t.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("t2"))
                & (F.col("ts") <= F.col("t2") + hop),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = t.groupBy("user_id").agg(
        F.max(F.col("t1").isNotNull().cast("int")).alias("s1"),
        F.max(F.col("t2").isNotNull().cast("int")).alias("s2"),
        F.max(F.col("t3").isNotNull().cast("int")).alias("s3"),
    )
    stage = (F.col("s1") + F.col("s2") + F.col("s3")).cast("bigint")
    return (
        per_user.select(stage.alias("funnel_stage"))
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


SQL_EVENT_FUNNEL = """
WITH t AS (
  SELECT user_id, ts, event_id, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
             OVER w AS t1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
),
t2s AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t1
                      AND ts <= t1 + INTERVAL 1 HOUR THEN ts END)
                OVER w AS t2
  FROM t
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
),
t3s AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t2
                      AND ts <= t2 + INTERVAL 1 HOUR THEN ts END)
                OVER w AS t3
  FROM t2s
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
),
per_user AS (
  SELECT user_id,
         max(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS s1,
         max(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS s2,
         max(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS s3
  FROM t3s GROUP BY 1
)
SELECT CAST(s1 + s2 + s3 AS BIGINT) AS funnel_stage,
       count(*) AS n_users
FROM per_user GROUP BY 1
"""


def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 20-bin histogram of event values: one aggregate for
    the global (min, max), broadcast to the scan, bucket assignment
    map-side, one partial-aggregating shuffle on the bucket id.  The
    bucket expression is mirrored token-for-token in the oracle so the
    IEEE arithmetic (and thus edge-of-bin assignment) is identical."""
    e = _t(spark, sf_dir, "events")
    bounds = e.agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    b = e.crossJoin(F.broadcast(bounds))
    bucket = F.least(
        F.lit(19),
        F.floor(
            (F.col("value") - F.col("vmin"))
            / (F.col("vmax") - F.col("vmin"))
            * 20
        ),
    ).cast("bigint")
    return (
        b.select(bucket.alias("bucket"), "vmin", "vmax")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.min(F.col("vmin") + (F.col("vmax") - F.col("vmin")) / 20 * F.col("bucket")),
                6,
            ).alias("lo"),
        )
    )


SQL_AGG_HISTOGRAM = """
WITH bounds AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
b AS (
  SELECT least(19, CAST(floor((value - vmin) / (vmax - vmin) * 20) AS BIGINT))
           AS bucket,
         vmin, vmax
  FROM events CROSS JOIN bounds
)
SELECT bucket, count(*) AS n,
       round(min(vmin + (vmax - vmin) / 20 * bucket), 6) AS lo
FROM b GROUP BY 1
"""


def _interleave_bits(x, y, bits: int = 16):
    """Morton/Z-order interleave of two non-negative ints, built as a
    pure Catalyst expression tree (no UDF): bit i of x -> bit 2i, bit
    i of y -> bit 2i+1."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z.bitwiseOR(
                F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            )
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def q_cluster_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, value-decile):
    interleaving the two dimensions' bits gives a 1-D sort key whose
    ranges are 2-D locality blocks — sortWithinPartitions(zval) before
    a parquet write yields min/max column stats that prune on BOTH
    dimensions.  The z-value is a pure codegen bit expression; the
    decile uses fixed bounds so both engines agree exactly."""
    e = _t(spark, sf_dir, "events")
    x = F.col("user_id").cast("bigint")
    y = F.least(F.lit(9), F.floor(F.col("value") / 100.0)).cast("bigint")
    z = _interleave_bits(x, y)
    return e.select(
        "event_id",
        x.alias("x"),
        y.alias("y"),
        z.alias("zval"),
        F.shiftright(z, 6).alias("zbucket"),
    )


def _sql_interleave(xe: str, ye: str, bits: int = 16) -> str:
    parts = []
    for i in range(bits):
        parts.append(f"((({xe} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({ye} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(parts)


SQL_CLUSTER_ZORDER = f"""
WITH d AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS x,
         CAST(least(9, floor(value / 100.0)) AS BIGINT) AS y
  FROM events
)
SELECT event_id, x, y, zval, zval >> 6 AS zbucket
FROM (
  SELECT event_id, x, y, ({_sql_interleave('x', 'y')}) AS zval
  FROM d
)
"""


def q_contract_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract enforcement over events: declarative rules
    (not-null ids, value range, event_type enum, ts window) compiled to
    one map-side expression block; output = per-rule violation counts
    plus the clean-row count, so the oracle checks both the rule logic
    and the quarantine split."""
    from ..operators.contracts import in_range, in_set, not_null, validate

    e = _t(spark, sf_dir, "events")
    rules = [
        not_null("event_id"),
        not_null("user_id"),
        in_range("value", 0.0, 500.0),
        in_set("event_type", ["view", "click", "purchase", "signup", "error"]),
    ]
    clean, violations = validate(e, rules)
    counts = violations.groupBy("violated_rule").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = clean.agg(
        F.lit("__clean__").alias("violated_rule"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return counts.unionByName(total)


SQL_CONTRACT_VIOLATIONS = """
WITH checks AS (
  SELECT
    CASE WHEN event_id IS NULL THEN 1 ELSE 0 END AS f_eid,
    CASE WHEN user_id IS NULL THEN 1 ELSE 0 END AS f_uid,
    CASE WHEN value IS NOT NULL AND (value < 0.0 OR value > 500.0)
         THEN 1 ELSE 0 END AS f_range,
    CASE WHEN event_type IS NOT NULL AND event_type NOT IN
              ('view','click','purchase','signup','error')
         THEN 1 ELSE 0 END AS f_enum
  FROM events
)
SELECT 'event_id_not_null' AS violated_rule,
       CAST(sum(f_eid) AS BIGINT) AS n_rows
FROM checks HAVING sum(f_eid) > 0
UNION ALL
SELECT 'user_id_not_null', CAST(sum(f_uid) AS BIGINT)
FROM checks HAVING sum(f_uid) > 0
UNION ALL
SELECT 'value_in_range', CAST(sum(f_range) AS BIGINT)
FROM checks HAVING sum(f_range) > 0
UNION ALL
SELECT 'event_type_in_set', CAST(sum(f_enum) AS BIGINT)
FROM checks HAVING sum(f_enum) > 0
UNION ALL
SELECT '__clean__', count(*) FROM checks
WHERE f_eid = 0 AND f_uid = 0 AND f_range = 0 AND f_enum = 0
"""




def q_events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational rate monitoring: hourly event counts per type,
    z-scored against that type's own hourly distribution over the
    whole window; hours with |z| >= 2 surface as anomalies.  The
    monitoring query every streaming ingest pipeline runs next to its
    business queries.

    Two hash aggregates (hour counts, per-type moments) + one broadcast
    join of the 5-row moments table — no windows, no global sort, so
    the shape is flat at any event volume.  Determinism: z is rounded
    to 4 before the threshold filter on both engines (house rule for
    float ranking/filtering decisions).
    """
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    moments = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    return (
        hourly.join(F.broadcast(moments), "event_type")
        .withColumn(
            "z_r", F.round((F.col("n") - F.col("mu")) / F.col("sd"), 4)
        )
        .filter(F.abs(F.col("z_r")) >= 2)
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour"),
            F.col("n").cast("bigint").alias("n"),
            "z_r",
        )
    )


SQL_EVENTS_RATE_ANOMALY = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
  FROM events GROUP BY 1, 2
),
moments AS (
  SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd
  FROM hourly GROUP BY 1
)
SELECT h.event_type,
       strftime(h.hour, '%Y-%m-%d %H:00') AS hour,
       CAST(h.n AS BIGINT) AS n,
       round((h.n - m.mu) / m.sd, 4) AS z_r
FROM hourly h JOIN moments m USING (event_type)
WHERE abs(round((h.n - m.mu) / m.sd, 4)) >= 2
"""




def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized path analytics: within 30-minute user sessions
    (operators/relational.sessionize), count event_type -> event_type
    transitions and report each transition's share of its source
    type's outgoing edges — the Markov-transition table behind funnel
    and journey analysis.

    One shuffle for the session window (keyed by user — distributed),
    one aggregate for the edge counts, one broadcast join for the
    per-source totals.  Ties inside a session order by event_id, so
    the lag sequence is deterministic on both engines.
    """
    from ..operators.relational import sessionize

    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sess = sessionize(e, key="user_id", ts="ts", gap_seconds=1800,
                      order_tiebreak="event_id")
    w = Window.partitionBy("user_id", "session_id").orderBy(
        F.col("ts"), F.col("event_id")
    )
    steps = sess.withColumn("prev", F.lag("event_type").over(w)).filter(
        F.col("prev").isNotNull()
    )
    edges = steps.groupBy(
        F.col("prev").alias("src"), F.col("event_type").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    totals = edges.groupBy("src").agg(F.sum("n").alias("tot"))
    return (
        edges.join(F.broadcast(totals), "src")
        .select(
            "src",
            "dst",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("tot"), 4).alias("share"),
        )
    )


SQL_EVENT_TRANSITIONS = """
WITH sess AS (
  SELECT user_id, event_type, ts, event_id,
         sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM (
    SELECT user_id, event_type, ts, event_id,
           epoch_us(ts) AS us,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_us
    FROM events WHERE user_id IS NOT NULL
  )
),
steps AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id, session_id
                               ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM sess
),
edges AS (
  SELECT src, dst, count(*) AS n FROM steps WHERE src IS NOT NULL
  GROUP BY 1, 2
),
totals AS (SELECT src, sum(n) AS tot FROM edges GROUP BY 1)
SELECT e.src, e.dst, CAST(e.n AS BIGINT) AS n,
       round(e.n / CAST(t.tot AS DOUBLE), 4) AS share
FROM edges e JOIN totals t USING (src)
"""


QUERIES: dict[str, QuerySpec] = {
    "agg_corr": QuerySpec(q_agg_corr, SQL_AGG_CORR),
    "contract_violations": QuerySpec(
        q_contract_violations, SQL_CONTRACT_VIOLATIONS
    ),
    "agg_string_collect": QuerySpec(q_agg_string_collect, SQL_AGG_STRING_COLLECT),
    "tpch_q8ish": QuerySpec(q_tpch_q8ish, SQL_TPCH_Q8ISH),
    "tpch_q9ish": QuerySpec(q_tpch_q9ish, SQL_TPCH_Q9ISH),
    "tpch_q13ish": QuerySpec(q_tpch_q13ish, SQL_TPCH_Q13ISH),
    "tpch_q16ish": QuerySpec(q_tpch_q16ish, SQL_TPCH_Q16ISH),
    "profile_columns": QuerySpec(q_profile_columns, SQL_PROFILE_COLUMNS),
    "event_funnel": QuerySpec(q_event_funnel, SQL_EVENT_FUNNEL),
    "events_rate_anomaly": QuerySpec(
        q_events_rate_anomaly, SQL_EVENTS_RATE_ANOMALY
    ),
    "event_transitions": QuerySpec(
        q_event_transitions, SQL_EVENT_TRANSITIONS
    ),
    "agg_histogram": QuerySpec(q_agg_histogram, SQL_AGG_HISTOGRAM),
    "cluster_zorder": QuerySpec(q_cluster_zorder, SQL_CLUSTER_ZORDER),
}
