"""Relational operator inventory, batch 2: HAVING, exact/approx
percentiles, analytic windows (percent_rank/cume_dist), date
arithmetic, regex extraction, positional explode, explicit cross join,
union-by-name, INTERSECT/EXCEPT ALL, scalar + IN subqueries,
limit/offset pagination, unpivot."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned


_t = load_tuned


def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING (post-aggregation filter)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"), F.round(F.avg("p_retailprice"), 2).alias("avg_price"))
        .filter(F.col("n_parts") >= 20)
    )


SQL_AGG_HAVING = """
SELECT p_brand, count(*) AS n_parts, round(avg(p_retailprice), 2) AS avg_price
FROM part GROUP BY p_brand HAVING count(*) >= 20
"""


def q_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median (percentile_cont 0.5)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        # floor(x*100+0.5)/100, not round(x, 2): the interpolated
        # midpoint can land on a cent tie where the engines' round()
        # semantics differ (the agg_percentile_approx precedent).
        (
            F.floor(F.percentile("o_totalprice", F.lit(0.5)) * 100 + 0.5)
            / 100
        ).alias("median_price"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_AGG_MEDIAN = """
SELECT o_orderpriority,
       floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)
             * 100 + 0.5) / 100 AS median_price,
       count(*) AS n
FROM orders GROUP BY o_orderpriority
"""


def q_agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile with a bounded-error oracle: the sketch
    estimate is engine-specific, so the query emits the EXACT p90
    (interpolated, same definition as DuckDB quantile_cont) plus a
    within-1%-of-exact boolean computed from the approximate sketch
    (accuracy 1000 -> measured error is ~0.1% at every SF).  Both
    output columns are deterministic, so the driver can hash-compare;
    the approximate aggregate is still exercised through ``approx_ok``.
    The 2-decimal round uses floor(x*100+0.5)/100 on both sides —
    Spark round and DuckDB round diverge on half-way ties."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", F.lit(0.9), F.lit(1000)).alias("a"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("e"),
        )
        .select(
            "l_returnflag",
            (F.floor(F.col("e") * 100 + 0.5) / 100).alias("p90_exact"),
            (F.abs(F.col("a") - F.col("e")) / F.col("e") <= 0.01).alias("approx_ok"),
        )
    )


SQL_AGG_PERCENTILE_APPROX = """
SELECT l_returnflag,
       floor(quantile_cont(l_extendedprice, 0.9) * 100 + 0.5) / 100 AS p90_exact,
       TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag
"""


def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist analytic windows."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


SQL_WINDOW_PERCENT_RANK = """
SELECT c_custkey, c_mktsegment,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: add days, last_day, quarter, day-of-week."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).cast("int").alias("q"),
        F.dayofweek(d).cast("int").alias("dow"),  # 1=Sunday in Spark
    )


SQL_DATE_ARITHMETIC = """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
FROM orders
"""


def q_regexp_extract_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction from the JSON-ish props string."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", r'"k": (\d+)', 1).cast("int").alias("k_extracted"),
    )


SQL_REGEXP_EXTRACT_GROUP = """
SELECT event_id,
       CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) AS k_extracted
FROM events
"""


def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode: (position, token) pairs for the first 5
    tokens of each short document."""
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") < 120)
    toks = F.slice(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0), 1, 5)
    return d.select("doc_id", F.posexplode(toks).alias("pos", "token")).withColumn(
        "pos", (F.col("pos") + 1).cast("int")  # 1-based like SQL ordinality
    )


SQL_POSEXPLODE_TOKENS = """
WITH w AS (
  SELECT doc_id, (regexp_extract_all(lower(text), '[a-z]+'))[1:5] AS toks
  FROM documents WHERE n_chars < 120
),
e AS (
  SELECT doc_id,
         unnest([{'pos': i, 'token': toks[i]} for i in range(1, len(toks)+1)]) AS u
  FROM w
)
SELECT doc_id, CAST(u.pos AS INTEGER) AS pos, u.token AS token FROM e
"""


def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (small x small only — by construction)."""
    r = _t(spark, sf_dir, "region").select(F.col("r_name").alias("region_a"))
    r2 = _t(spark, sf_dir, "region").select(F.col("r_name").alias("region_b"))
    return r.crossJoin(r2).filter(F.col("region_a") < F.col("region_b"))


SQL_CROSS_JOIN = """
SELECT a.r_name AS region_a, b.r_name AS region_b
FROM region a CROSS JOIN region b
WHERE a.r_name < b.r_name
"""


def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with missing columns (schema evolution union)."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("balance"),
        F.lit("customer").alias("kind"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s, allowMissingColumns=True).select(
        "key", F.round("balance", 2).alias("balance"), "kind"
    )


SQL_UNION_BY_NAME = """
SELECT key, round(balance, 2) AS balance, kind FROM (
  SELECT c_custkey AS key, c_acctbal AS balance, 'customer' AS kind FROM customer
  UNION ALL BY NAME
  SELECT s_suppkey AS key, 'supplier' AS kind FROM supplier
)
"""


def q_setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity preserved)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


SQL_SETOP_INTERSECT_ALL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference)."""
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    n = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    return s.exceptAll(n)


SQL_SETOP_EXCEPT_ALL = """
SELECT s_nationkey AS nationkey FROM supplier
EXCEPT ALL
SELECT n_nationkey AS nationkey FROM nation
"""


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("ssq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS total
        FROM ssq_orders
        WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM ssq_orders)
        """
    )


SQL_SCALAR_SUBQUERY = """
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders
WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
"""


def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) — semi-join after decorrelation."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    c.createOrReplaceTempView("isq_customer")
    s.createOrReplaceTempView("isq_supplier")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey FROM isq_customer
        WHERE c_nationkey IN (SELECT s_nationkey FROM isq_supplier
                              WHERE s_acctbal > 5000)
        """
    )


SQL_IN_SUBQUERY = """
SELECT c_custkey, c_nationkey FROM customer
WHERE c_nationkey IN (SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)
"""


def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination: total order + OFFSET/LIMIT."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .offset(10)
        .limit(20)
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


SQL_LIMIT_OFFSET = """
SELECT c_custkey, round(c_acctbal, 2) AS acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 20 OFFSET 10
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long): per-customer metrics as rows."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', round(c_acctbal, 2), "
            "'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, value)"
        ),
    )


SQL_UNPIVOT = """
SELECT c_custkey, metric, value FROM (
  SELECT c_custkey, 'acctbal' AS metric, round(c_acctbal, 2) AS value
  FROM customer WHERE c_custkey < 100
  UNION ALL
  SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value
  FROM customer WHERE c_custkey < 100
)
"""


QUERIES: dict[str, QuerySpec] = {
    "agg_having": QuerySpec(q_agg_having, SQL_AGG_HAVING),
    "agg_median": QuerySpec(q_agg_median, SQL_AGG_MEDIAN),
    "agg_percentile_approx": QuerySpec(
        q_agg_percentile_approx, SQL_AGG_PERCENTILE_APPROX
    ),
    "window_percent_rank": QuerySpec(q_window_percent_rank, SQL_WINDOW_PERCENT_RANK),
    "date_arithmetic": QuerySpec(q_date_arithmetic, SQL_DATE_ARITHMETIC),
    "regexp_extract_group": QuerySpec(q_regexp_extract_group, SQL_REGEXP_EXTRACT_GROUP),
    "posexplode_tokens": QuerySpec(q_posexplode_tokens, SQL_POSEXPLODE_TOKENS),
    "cross_join": QuerySpec(q_cross_join, SQL_CROSS_JOIN),
    "union_by_name": QuerySpec(q_union_by_name, SQL_UNION_BY_NAME),
    "setop_intersect_all": QuerySpec(q_setop_intersect_all, SQL_SETOP_INTERSECT_ALL),
    "setop_except_all": QuerySpec(q_setop_except_all, SQL_SETOP_EXCEPT_ALL),
    "scalar_subquery": QuerySpec(q_scalar_subquery, SQL_SCALAR_SUBQUERY),
    "in_subquery": QuerySpec(q_in_subquery, SQL_IN_SUBQUERY),
    "limit_offset": QuerySpec(q_limit_offset, SQL_LIMIT_OFFSET),
    "unpivot": QuerySpec(q_unpivot, SQL_UNPIVOT),
}
