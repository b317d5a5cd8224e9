"""Round-6 batch 23: SCD2 consistency auditing, revenue-bridge
decomposition, and exact-duplicate vector detection.

Why these belong in a 100 TB training-data engine:

* ``scd2_consistency_audit`` — every slowly-changing dimension needs
  an invariant audit (no overlapping validity windows, no gaps,
  exactly one open row per key, no adjacent same-state rows); this
  op runs it over the engine's own SCD2 build, composing the
  registry's ``scd2_user_state`` directly.  Violation counts come
  from per-key lag windows — the same partitioning the build itself
  used, so the audit rides the existing shuffle.
* ``orders_revenue_bridge`` — the period-over-period revenue bridge
  (volume effect at old prices + price/mix residual + new/lost
  products) is THE finance decomposition; computed per part then
  rolled to product type, with the additivity identity
  delta = volume + price + new - lost holding EXACTLY because the
  price effect is the residual (integer cents end-to-end except the
  one double-first volume floor).
* ``embed_exact_dup_vectors`` — byte-identical embeddings (re-runs,
  ingestion retries) silently skew ANN statistics; a milli-quantized
  signature hash finds them in one aggregate.

Engine-parity notes: the audit and dup counts are pure integers;
the bridge's volume effect floors a double built from exact integer
(qty, cents) aggregates with zero-qty guards; the vector signature
is md5 over milli-rounded components joined with ':' — identical
byte streams on both engines.

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; extends SURVEY.md §2.B's warehouse / embed
categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned

_t = load_tuned


# --------------------------------------------------------------------
# SCD2 invariant audit (composes the registry's own SCD2 build)
# --------------------------------------------------------------------


def q_scd2_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant audit over the ``scd2_user_state`` build: counts of
    overlapping windows, coverage gaps, keys with != 1 open row, and
    adjacent same-state rows (island-collapse violations).  All four
    must be zero for a healthy build — the audit is the op that
    PROVES it, and it is what runs nightly against any SCD2 table.

    Scale: composes the SCD2 frame (one user_id shuffle), then one
    per-key lag window on the interval frame (orders of magnitude
    smaller than events) and a global count rollup."""
    from .warehouse import q_scd2_user_state

    scd = q_scd2_user_state(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("valid_from_us")
    flagged = (
        scd.withColumn("next_from", F.lead("valid_from_us").over(w))
        .withColumn("next_type", F.lead("event_type").over(w))
        .select(
            "user_id",
            "is_current",
            F.when(
                F.col("valid_to_us").isNotNull()
                & (F.col("next_from") < F.col("valid_to_us")),
                1,
            ).otherwise(0).alias("overlap"),
            F.when(
                F.col("valid_to_us").isNotNull()
                & (F.col("next_from") > F.col("valid_to_us")),
                1,
            ).otherwise(0).alias("gap"),
            F.when(
                F.col("next_type").isNotNull()
                & (F.col("next_type") == F.col("event_type")),
                1,
            ).otherwise(0).alias("same_state"),
        )
    )
    per_user = flagged.groupBy("user_id").agg(
        F.sum("overlap").alias("o"),
        F.sum("gap").alias("g"),
        F.sum("same_state").alias("s"),
        F.sum(F.col("is_current").cast("int")).alias("n_open"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("o").alias("n_overlaps"),
        F.sum("g").alias("n_gaps"),
        F.sum("s").alias("n_adjacent_same_state"),
        F.sum(F.when(F.col("n_open") != 1, 1).otherwise(0)).alias(
            "n_bad_open_counts"
        ),
    )


def _audit_sql() -> str:
    from .warehouse import SQL_SCD2_USER_STATE

    return f"""
WITH scd AS ({SQL_SCD2_USER_STATE}),
flagged AS (
  SELECT user_id, is_current,
         CASE WHEN valid_to_us IS NOT NULL
                   AND lead(valid_from_us) OVER w < valid_to_us
              THEN 1 ELSE 0 END AS overlap,
         CASE WHEN valid_to_us IS NOT NULL
                   AND lead(valid_from_us) OVER w > valid_to_us
              THEN 1 ELSE 0 END AS gap,
         CASE WHEN lead(event_type) OVER w IS NOT NULL
                   AND lead(event_type) OVER w = event_type
              THEN 1 ELSE 0 END AS same_state
  FROM scd
  WINDOW w AS (PARTITION BY user_id ORDER BY valid_from_us)
),
per_user AS (
  SELECT user_id, sum(overlap) AS o, sum(gap) AS g,
         sum(same_state) AS s,
         sum(CASE WHEN is_current THEN 1 ELSE 0 END) AS n_open
  FROM flagged GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(o) AS BIGINT) AS n_overlaps,
       CAST(sum(g) AS BIGINT) AS n_gaps,
       CAST(sum(s) AS BIGINT) AS n_adjacent_same_state,
       CAST(sum(CASE WHEN n_open <> 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bad_open_counts
FROM per_user
"""


SQL_SCD2_CONSISTENCY_AUDIT = _audit_sql()


# --------------------------------------------------------------------
# revenue bridge (volume / price / new / lost decomposition)
# --------------------------------------------------------------------


def q_orders_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period revenue bridge per product type: the order
    date span splits at its midpoint into P1/P2; per part, the
    revenue delta decomposes into a volume effect at P1 prices
    (double-first floor), a price/mix residual (exact by
    construction, so the bridge ADDS UP), and new/lost product
    effects; rolled up per p_type.

    Scale: one lineitem+orders join shuffles on the order key, one
    broadcast date-bounds scalar, one part-keyed aggregate per
    period (full-outer joined on part), one broadcast part dim for
    the type rollup."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    bounds = orders.agg(
        F.min("od").alias("mn"), F.max("od").alias("mx")
    ).select(
        F.expr("date_add(mn, CAST(datediff(mx, mn) DIV 2 AS INT))").alias(
            "mid"
        )
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("q"),
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
        )
        .cast("bigint")
        .alias("r"),
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .crossJoin(F.broadcast(bounds))
        .withColumn("period", F.when(F.col("od") <= F.col("mid"), 1).otherwise(2))
    )
    per = j.groupBy("l_partkey").agg(
        F.sum(F.when(F.col("period") == 1, F.col("q")).otherwise(0)).alias(
            "q1"
        ),
        F.sum(F.when(F.col("period") == 1, F.col("r")).otherwise(0)).alias(
            "r1"
        ),
        F.sum(F.when(F.col("period") == 2, F.col("q")).otherwise(0)).alias(
            "q2"
        ),
        F.sum(F.when(F.col("period") == 2, F.col("r")).otherwise(0)).alias(
            "r2"
        ),
    )
    vol = F.when(
        (F.col("q1") > 0) & (F.col("q2") > 0),
        F.floor(
            (F.col("q2") - F.col("q1")).cast("double")
            * F.col("r1").cast("double")
            / F.col("q1").cast("double")
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    effects = per.select(
        "l_partkey",
        "r1",
        "r2",
        vol.alias("volume_effect"),
        # the residual makes the bridge exact: delta = vol + price
        # + new - lost for every part, hence for every rollup
        F.when(
            (F.col("q1") > 0) & (F.col("q2") > 0),
            F.col("r2") - F.col("r1") - vol,
        ).otherwise(F.lit(0)).alias("price_effect"),
        F.when((F.col("q1") == 0) & (F.col("q2") > 0), F.col("r2"))
        .otherwise(F.lit(0))
        .alias("new_effect"),
        F.when((F.col("q2") == 0) & (F.col("q1") > 0), F.col("r1"))
        .otherwise(F.lit(0))
        .alias("lost_effect"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        effects.join(
            F.broadcast(part), effects.l_partkey == part.p_partkey
        )
        .groupBy("p_type")
        .agg(
            F.sum("r1").alias("rev1_cents"),
            F.sum("r2").alias("rev2_cents"),
            F.sum("volume_effect").alias("volume_effect_cents"),
            F.sum("price_effect").alias("price_effect_cents"),
            F.sum("new_effect").alias("new_effect_cents"),
            F.sum("lost_effect").alias("lost_effect_cents"),
        )
        .orderBy("p_type")
    )


SQL_ORDERS_REVENUE_BRIDGE = """
WITH o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders
),
bounds AS (
  SELECT min(od) + CAST(date_diff('day', min(od), max(od)) // 2 AS INT)
           AS mid
  FROM o
),
li AS (
  SELECT l_orderkey, l_partkey,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS r
  FROM lineitem
),
j AS (
  SELECT li.l_partkey, li.q, li.r,
         CASE WHEN o.od <= b.mid THEN 1 ELSE 2 END AS period
  FROM li JOIN o ON o.o_orderkey = li.l_orderkey
  CROSS JOIN bounds b
),
per AS (
  SELECT l_partkey,
         sum(CASE WHEN period = 1 THEN q ELSE 0 END) AS q1,
         sum(CASE WHEN period = 1 THEN r ELSE 0 END) AS r1,
         sum(CASE WHEN period = 2 THEN q ELSE 0 END) AS q2,
         sum(CASE WHEN period = 2 THEN r ELSE 0 END) AS r2
  FROM j GROUP BY 1
),
eff AS (
  SELECT l_partkey, r1, r2,
         CASE WHEN q1 > 0 AND q2 > 0 THEN
           CAST(floor(CAST(q2 - q1 AS DOUBLE) * CAST(r1 AS DOUBLE)
                      / CAST(q1 AS DOUBLE)) AS BIGINT)
         ELSE 0 END AS volume_effect,
         CASE WHEN q1 > 0 AND q2 > 0 THEN
           r2 - r1 - CAST(floor(CAST(q2 - q1 AS DOUBLE)
                                * CAST(r1 AS DOUBLE)
                                / CAST(q1 AS DOUBLE)) AS BIGINT)
         ELSE 0 END AS price_effect,
         CASE WHEN q1 = 0 AND q2 > 0 THEN r2 ELSE 0 END AS new_effect,
         CASE WHEN q2 = 0 AND q1 > 0 THEN r1 ELSE 0 END AS lost_effect
  FROM per
)
SELECT p.p_type,
       CAST(sum(e.r1) AS BIGINT) AS rev1_cents,
       CAST(sum(e.r2) AS BIGINT) AS rev2_cents,
       CAST(sum(e.volume_effect) AS BIGINT) AS volume_effect_cents,
       CAST(sum(e.price_effect) AS BIGINT) AS price_effect_cents,
       CAST(sum(e.new_effect) AS BIGINT) AS new_effect_cents,
       CAST(sum(e.lost_effect) AS BIGINT) AS lost_effect_cents
FROM eff e JOIN part p ON p.p_partkey = e.l_partkey
GROUP BY 1 ORDER BY p_type
"""


# --------------------------------------------------------------------
# exact-duplicate embedding vectors
# --------------------------------------------------------------------


def q_embed_exact_dup_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate embedding detection: vectors quantized to
    milli-units, signature = md5 of the ':'-joined components; one
    summary row (vector count, distinct signatures, duplicate
    vectors).

    Scale: one map-side signature + one aggregate with a distinct
    count — no joins, no windows."""
    sig = F.md5(
        F.array_join(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1000.0).cast(
                    "bigint"
                ).cast("string"),
            ),
            ":",
        )
    )
    v = _t(spark, sf_dir, "embeddings").select(sig.alias("sig"))
    return v.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.countDistinct("sig").alias("n_distinct_sigs"),
        (F.count(F.lit(1)) - F.countDistinct("sig")).alias("n_dup_vectors"),
    )


SQL_EMBED_EXACT_DUP_VECTORS = """
WITH sigs AS (
  SELECT md5(array_to_string(
           [CAST(CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)
                 AS VARCHAR) FOR x IN embedding], ':')) AS sig
  FROM embeddings
)
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(count(DISTINCT sig) AS BIGINT) AS n_distinct_sigs,
       CAST(count(*) - count(DISTINCT sig) AS BIGINT) AS n_dup_vectors
FROM sigs
"""


QUERIES: dict[str, QuerySpec] = {
    "scd2_consistency_audit": QuerySpec(
        q_scd2_consistency_audit, SQL_SCD2_CONSISTENCY_AUDIT
    ),
    "orders_revenue_bridge": QuerySpec(
        q_orders_revenue_bridge, SQL_ORDERS_REVENUE_BRIDGE
    ),
    "embed_exact_dup_vectors": QuerySpec(
        q_embed_exact_dup_vectors, SQL_EMBED_EXACT_DUP_VECTORS
    ),
}
