"""Relational batch 3: multi-way star joins (TPC-H Q5/Q6 shapes) and
explicit skew-mitigation (salted join) whose oracle twin is the plain
join — proving the salt is a pure physical rewrite."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned


_t = load_tuned


def q_tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, revenue per nation for one region
    and a date window, with semi-join reduction: the region predicate
    is pushed through nation onto BOTH customer and supplier before
    any fact-table join, so the big l|x|o shuffle only carries rows
    that can survive (region cuts 1/5 of nations -> 1/5 of customers
    and suppliers).  Measured ~25% faster warm at sf0.1 than the
    join-then-filter form, and structurally smaller shuffles at any
    scale.  Dimension chain region->nation broadcasts; customer stays
    AQE-sized (no forced hint — it grows with scale factor)."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    n_asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(n_asia),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_nationkey", "n_name")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n_asia.select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        # Q5 additionally requires supplier and customer in the same
        # nation; keep that predicate for selectivity.
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_TPCH_Q5ISH = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND s_nationkey = c_nationkey
GROUP BY n_name
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the pushdown showcase
    (every predicate reaches the parquet reader)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


SQL_TPCH_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    salt_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Skew-mitigated equi-join: the fact side gets a row-local salt,
    the dimension side is exploded N ways, and the join key becomes
    (key, salt) — splitting one hot key's rows across N tasks.

    The result is row-identical to ``facts.join(dim, key)``; only the
    physical distribution changes.  AQE's skew-join handles moderate
    skew automatically; explicit salting is for the pathological keys
    AQE cannot split (single-key hot partitions in non-sort-merge
    plans).

    Salt derivation — two modes:

    - ``salt_cols`` given (preferred): ``pmod(xxhash64(salt_cols), N)``
      — fully DETERMINISTIC, so a map stage recomputed after a
      shuffle-fetch failure re-derives identical salts and the
      row-identical guarantee holds under stage retries.  Pass a
      unique-ish discriminator (an event id, a rowid) so duplicate
      rows of a hot key still spread; hashing only the discriminator
      also avoids per-row hashing of wide payload columns.
    - no ``salt_cols``: ``monotonically_increasing_id() mod N``.
      Spreads even byte-identical duplicate rows, but the id is a
      NONDETERMINISTIC partition-dependent counter: if a stage is
      retried, re-executed rows can land in different salt buckets
      than the first attempt — the classic lost/duplicated-rows hazard
      of nondeterministic shuffle keys.  Acceptable for single-attempt
      local runs; on a real cluster prefer ``salt_cols``.
    """
    if salt_cols:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets)
        )
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    salted_facts = facts.withColumn("__salt", salt.cast("int"))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_facts.join(salted_dim, on=[key, "__salt"]).drop("__salt")


def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join whose oracle is the PLAIN join — the salt must be
    semantically invisible.  events.user_id plays the skewed fact key
    (every user's events split across 8 salt buckets)."""
    ev = _t(spark, sf_dir, "events")
    user_dim = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_total"))
    )
    joined = salted_join(
        ev, user_dim, key="user_id", salt_buckets=8, salt_cols=("event_id",)
    )
    return joined.groupBy("user_id", "user_total").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


SQL_JOIN_SALTED_SKEW = """
WITH user_dim AS (SELECT user_id, count(*) AS user_total FROM events GROUP BY user_id)
SELECT e.user_id, d.user_total, count(*) AS n, round(sum(e.value), 2) AS total_value
FROM events e JOIN user_dim d ON e.user_id = d.user_id
GROUP BY e.user_id, d.user_total
"""


def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join with unmatched rows on BOTH sides: high-balance
    customers vs customers who ordered in 1996.  Both inputs pre-reduce
    before the join (filter / partial agg), so the outer join shuffles
    only the keys that survive — at 100 TB the orders side arrives as a
    per-key count, not raw rows."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select("c_custkey", "c_acctbal")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_acctbal",
        "n_orders",
    )


SQL_JOIN_FULL_OUTER = """
WITH c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 7000),
o AS (SELECT o_custkey, count(*) AS n_orders FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY o_custkey)
SELECT coalesce(c_custkey, o_custkey) AS custkey, c_acctbal, n_orders
FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
"""


def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-outer join (order counts RIGHT JOIN customer): every
    customer survives, order-less ones with NULL count."""
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return o.join(c, o.o_custkey == c.c_custkey, "right_outer").select(
        "c_custkey", "c_mktsegment", "n_orders"
    )


SQL_JOIN_RIGHT_OUTER = """
SELECT c_custkey, c_mktsegment, n_orders
FROM (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
"""


QUERIES: dict[str, QuerySpec] = {
    "tpch_q5ish": QuerySpec(q_tpch_q5ish, SQL_TPCH_Q5ISH),
    "tpch_q6": QuerySpec(q_tpch_q6, SQL_TPCH_Q6),
    "join_salted_skew": QuerySpec(q_join_salted_skew, SQL_JOIN_SALTED_SKEW),
    "join_full_outer": QuerySpec(q_join_full_outer, SQL_JOIN_FULL_OUTER),
    "join_right_outer": QuerySpec(q_join_right_outer, SQL_JOIN_RIGHT_OUTER),
}
