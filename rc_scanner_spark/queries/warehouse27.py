"""Round-8 batch 35: paired-conversion and effect-size statistics.

* ``stats_mcnemar`` — McNemar's test (continuity-corrected) on paired
  pre/post purchase conversion per user around the epoch midpoint:
  the right test when the SAME users are observed in both periods
  (a two-proportion z-test would ignore the pairing).
* ``stats_cohens_d`` — Cohen's d standardized effect size between the
  hash-split variants on per-user post-period spend: the
  "is this difference big or just significant" companion every A/B
  readout needs next to its p-value.

Engine-parity: both fold from integer-cent conditional aggregates;
the only doubles are the final scalar chains, written identically on
both sides; degenerate inputs (no discordant pairs, sub-2-user
variants, zero pooled variance) yield NULL on BOTH engines.

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; extends SURVEY.md §2.B's stats category.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned
from .warehouse3 import SQL_AB_BUCKET, ab_bucket_col
from .warehouse25 import SQL_EPOCH_MID_CTE, epoch_mid

_t = load_tuned


def _per_user_prepost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user pre/post frame around the integer epoch midpoint:
    purchase-conversion flags and post-period spend cents."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        # when/otherwise, not a bool cast: NULL event_type must flag 0
        # like the twin's CASE ... ELSE 0 (a bare comparison is NULL,
        # and a user whose period rows are all NULL-typed would fold
        # to a NULL conversion flag on Spark only — round-6 trap)
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("purch"),
    )
    mid = epoch_mid(ev)
    return (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("us") <= F.col("mid_us"), F.col("purch")).otherwise(F.lit(0))
            ).alias("pre_conv"),
            F.max(
                F.when(F.col("us") > F.col("mid_us"), F.col("purch")).otherwise(F.lit(0))
            ).alias("post_conv"),
            F.sum(
                F.when(F.col("us") > F.col("mid_us"), F.col("cents")).otherwise(F.lit(0))
            ).alias("post_cents"),
        )
    )


_SQL_PER_USER_CTE = f"""ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS purch
  FROM events
),
{SQL_EPOCH_MID_CTE},
per_user AS (
  SELECT user_id,
         max(CASE WHEN e.us <= m.mid_us THEN purch ELSE 0 END) AS pre_conv,
         max(CASE WHEN e.us > m.mid_us THEN purch ELSE 0 END) AS post_conv,
         CAST(sum(CASE WHEN e.us > m.mid_us THEN cents ELSE 0 END) AS BIGINT)
           AS post_cents
  FROM ev e CROSS JOIN mid m
  GROUP BY user_id
)"""


# --------------------------------------------------------------------
# McNemar paired-conversion test
# --------------------------------------------------------------------


def q_stats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuity-corrected McNemar statistic on paired pre/post
    conversion: χ² = (|b − c| − 1)² / (b + c) over the discordant
    pairs (b = converted pre only, c = post only).  NULL when there
    are no discordant pairs (the statistic is undefined — mirrored on
    both engines rather than fabricating 0).

    Scale: one user-keyed conditional aggregate + a four-cell fold to
    a single row; the midpoint is a 1-row broadcast."""
    pu = _per_user_prepost(spark, sf_dir)
    cells = pu.groupBy().agg(
        *[
            F.count(
                F.when(
                    (F.col("pre_conv") == a) & (F.col("post_conv") == b), F.lit(1)
                )
            ).alias(f"n{a}{b}")
            for a in (0, 1)
            for b in (0, 1)
        ]
    )
    b, c = F.col("n10"), F.col("n01")
    diff = F.abs(b - c).cast("double") - 1.0
    chi2 = F.when(
        (b + c) > 0, diff * diff / (b + c).cast("double")
    )
    return cells.select(
        F.col("n00").alias("n_never"),
        F.col("n01").alias("n_post_only"),
        F.col("n10").alias("n_pre_only"),
        F.col("n11").alias("n_both"),
        F.floor(chi2 * 1000 + 0.5).cast("long").alias("mcnemar_chi2_milli"),
    )


SQL_STATS_MCNEMAR = f"""
WITH {_SQL_PER_USER_CTE},
cells AS (
  SELECT
    count(CASE WHEN pre_conv = 0 AND post_conv = 0 THEN 1 END) AS n00,
    count(CASE WHEN pre_conv = 0 AND post_conv = 1 THEN 1 END) AS n01,
    count(CASE WHEN pre_conv = 1 AND post_conv = 0 THEN 1 END) AS n10,
    count(CASE WHEN pre_conv = 1 AND post_conv = 1 THEN 1 END) AS n11
  FROM per_user
)
SELECT CAST(n00 AS BIGINT) AS n_never, CAST(n01 AS BIGINT) AS n_post_only,
       CAST(n10 AS BIGINT) AS n_pre_only, CAST(n11 AS BIGINT) AS n_both,
       CAST(floor(CASE WHEN (n10 + n01) > 0 THEN
            (CAST(abs(n10 - n01) AS DOUBLE) - 1.0)
            * (CAST(abs(n10 - n01) AS DOUBLE) - 1.0)
            / CAST(n10 + n01 AS DOUBLE)
       END * 1000 + 0.5) AS BIGINT) AS mcnemar_chi2_milli
FROM cells
"""


# --------------------------------------------------------------------
# Cohen's d effect size
# --------------------------------------------------------------------


def q_stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d between the hash-split variants on per-user
    post-period spend: d = (m_t − m_c) / s_pooled with the
    (n−1)-weighted pooled standard deviation.  NULL when either
    variant has < 2 users or the pooled variance is 0 — mirrored on
    both engines.

    Scale: one user-keyed aggregate, a 2-row variant fold, one
    closed-form scalar row."""
    pu = _per_user_prepost(spark, sf_dir).select(
        F.when(ab_bucket_col() < 500, F.lit("control"))
        .otherwise(F.lit("treatment"))
        .alias("variant"),
        "post_cents",
    )
    pv = pu.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("post_cents").alias("s"),
        # cast the OPERAND before multiplying (review r8 convention):
        # a long*long square overflows 2^63 at ~$30.4M per-user spend
        # and throws under ANSI; the twin widens to HUGEINT first
        F.sum(
            F.col("post_cents").cast("decimal(38,0)") * F.col("post_cents")
        ).alias("ss"),
    )
    one = pv.groupBy().agg(
        F.max(F.when(F.col("variant") == "control", F.col("n"))).alias("nc"),
        F.max(F.when(F.col("variant") == "control", F.col("s"))).alias("sc"),
        F.max(F.when(F.col("variant") == "control", F.col("ss"))).alias("ssc"),
        F.max(F.when(F.col("variant") == "treatment", F.col("n"))).alias("nt"),
        F.max(F.when(F.col("variant") == "treatment", F.col("s"))).alias("st"),
        F.max(F.when(F.col("variant") == "treatment", F.col("ss"))).alias("sst"),
    )
    ncd = F.col("nc").cast("double")
    ntd = F.col("nt").cast("double")
    mc = F.col("sc").cast("double") / ncd
    mt = F.col("st").cast("double") / ntd
    # (n-1)·s² = ss - s²/n, clamped at 0 (float rounding — review r8
    # Neyman precedent)
    q_c = F.greatest(
        F.col("ssc").cast("double") - F.col("sc").cast("double") * F.col("sc").cast("double") / ncd,
        F.lit(0.0),
    )
    q_t = F.greatest(
        F.col("sst").cast("double") - F.col("st").cast("double") * F.col("st").cast("double") / ntd,
        F.lit(0.0),
    )
    s_pool = F.sqrt((q_c + q_t) / (ncd + ntd - 2.0))
    d = F.when(
        (F.col("nc") >= 2) & (F.col("nt") >= 2) & (s_pool > 0),
        (mt - mc) / s_pool,
    )
    return one.select(
        F.col("nc").cast("long").alias("n_control"),
        F.col("nt").cast("long").alias("n_treatment"),
        F.floor(mc * 10 + 0.5).cast("long").alias("mean_control_milli"),
        F.floor(mt * 10 + 0.5).cast("long").alias("mean_treatment_milli"),
        F.floor(d * 1000 + 0.5).cast("long").alias("cohens_d_milli"),
    )


SQL_STATS_COHENS_D = f"""
WITH {_SQL_PER_USER_CTE},
pv AS (
  SELECT CASE WHEN {SQL_AB_BUCKET} < 500
              THEN 'control' ELSE 'treatment' END AS variant,
         count(*) AS n,
         CAST(sum(post_cents) AS BIGINT) AS s,
         sum(CAST(post_cents AS HUGEINT) * post_cents) AS ss
  FROM per_user
  GROUP BY 1
),
one AS (
  SELECT max(CASE WHEN variant = 'control' THEN n END) AS nc,
         max(CASE WHEN variant = 'control' THEN s END) AS sc,
         max(CASE WHEN variant = 'control' THEN ss END) AS ssc,
         max(CASE WHEN variant = 'treatment' THEN n END) AS nt,
         max(CASE WHEN variant = 'treatment' THEN s END) AS st,
         max(CASE WHEN variant = 'treatment' THEN ss END) AS sst
  FROM pv
),
calc AS (
  -- the pooled-std chain is defined ONCE here (it previously appeared
  -- verbatim in both the CASE guard and the division — an edit to one
  -- copy would silently break the NULL contract with the Spark side)
  SELECT nc, nt,
         CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) AS mc,
         CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) AS mt,
         sqrt((greatest(CAST(ssc AS DOUBLE)
                        - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                          / CAST(nc AS DOUBLE), 0.0)
               + greatest(CAST(sst AS DOUBLE)
                        - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                          / CAST(nt AS DOUBLE), 0.0))
              / (CAST(nc AS DOUBLE) + CAST(nt AS DOUBLE) - 2.0)) AS s_pool
  FROM one
)
SELECT CAST(nc AS BIGINT) AS n_control, CAST(nt AS BIGINT) AS n_treatment,
       CAST(floor(mc * 10 + 0.5) AS BIGINT) AS mean_control_milli,
       CAST(floor(mt * 10 + 0.5) AS BIGINT) AS mean_treatment_milli,
       CAST(floor(
         CASE WHEN nc >= 2 AND nt >= 2 AND s_pool > 0
              THEN (mt - mc) / s_pool
         END * 1000 + 0.5) AS BIGINT) AS cohens_d_milli
FROM calc
"""





# --------------------------------------------------------------------
# ABC tier migration matrix (year-over-year)
# --------------------------------------------------------------------


def q_orders_tier_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer ABC-tier migration matrix: classify
    customers A/B/C within each year by cumulative spend share (A
    while the running share including the current customer stays
    <= 80%, B to 95%, C beyond — exact integer cross-multiplication,
    the warehouse9 ABC recipe on the customer axis), then count
    transitions from each year to the NEXT year; customers absent in
    the next year migrate to the 'GONE' tier.

    Scale: one (year, customer) aggregate; the rank/cumsum windows
    partition by YEAR (bounded partitions come from the customer
    count, the year count bounds the output); the self-join links
    year t to t+1 on the customer key."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    per = o.groupBy("yr", "o_custkey").agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("spend")
    )
    w = Window.partitionBy("yr").orderBy(F.desc("spend"), "o_custkey")
    wt = Window.partitionBy("yr")
    classed = (
        per.withColumn(
            "cum", F.sum("spend").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("tot", F.sum("spend").over(wt))
        .select(
            "yr",
            "o_custkey",
            F.when(F.col("cum") * 100 <= F.col("tot") * 80, F.lit("A"))
            .when(F.col("cum") * 100 <= F.col("tot") * 95, F.lit("B"))
            .otherwise(F.lit("C"))
            .alias("tier"),
        )
    )
    nxt = classed.select(
        (F.col("yr") - 1).alias("yr_prev"),
        F.col("o_custkey").alias("nk"),
        F.col("tier").alias("tier_to"),
    )
    return (
        classed.join(
            nxt,
            (F.col("yr") == F.col("yr_prev")) & (F.col("o_custkey") == F.col("nk")),
            "left",
        )
        .select(
            F.col("yr").alias("yr_from"),
            F.col("tier").alias("tier_from"),
            F.coalesce("tier_to", F.lit("GONE")).alias("tier_to"),
        )
        .groupBy("yr_from", "tier_from", "tier_to")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("yr_from", "tier_from", "tier_to")
    )


SQL_ORDERS_TIER_MIGRATION = """
WITH o AS (
  SELECT year(o_orderdate) AS yr, o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
per AS (
  SELECT yr, o_custkey, sum(cents) AS spend FROM o GROUP BY 1, 2
),
classed AS (
  SELECT yr, o_custkey,
         CASE WHEN sum(spend) OVER (PARTITION BY yr
                                    ORDER BY spend DESC, o_custkey
                                    ROWS UNBOUNDED PRECEDING) * 100
                   <= sum(spend) OVER (PARTITION BY yr) * 80 THEN 'A'
              WHEN sum(spend) OVER (PARTITION BY yr
                                    ORDER BY spend DESC, o_custkey
                                    ROWS UNBOUNDED PRECEDING) * 100
                   <= sum(spend) OVER (PARTITION BY yr) * 95 THEN 'B'
              ELSE 'C' END AS tier
  FROM per
)
SELECT c.yr AS yr_from, c.tier AS tier_from,
       coalesce(n.tier, 'GONE') AS tier_to,
       count(*) AS n_customers
FROM classed c
LEFT JOIN classed n ON n.yr = c.yr + 1 AND n.o_custkey = c.o_custkey
GROUP BY 1, 2, 3
ORDER BY yr_from, tier_from, tier_to
"""


# --------------------------------------------------------------------
# single-source supply risk
# --------------------------------------------------------------------


def q_part_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain concentration: band every traded part by its
    distinct supplier count (width-5 bands keyed by the band floor:
    1-5, 6-10, ...) and report part counts and revenue share per
    band — the "how much revenue rides on thinly-sourced parts" risk
    readout.  Single-source parts land in the lowest band.

    Scale: one (part, supplier) distinct aggregate from lineitem,
    one part fold, one bounded band fold with a 1-row revenue-total
    broadcast for the ppm share."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
        )
        .cast("long")
        .alias("rev_cents"),
    )
    per_part = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.sum(F.col("rev_cents").cast("decimal(38,0)")).alias("rev"),
    )
    band = (
        F.expr("(n_suppliers - 1) DIV 5") * 5 + 1
    ).cast("int")
    bands = per_part.select(band.alias("band_lo"), "rev").groupBy(
        "band_lo"
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev").cast("decimal(38,0)").alias("rev"),
    )
    tot = bands.agg(F.sum("rev").alias("tot"))
    share = F.when(
        F.col("tot") > 0,
        F.col("rev").cast("double") / F.col("tot").cast("double"),
    )
    return (
        bands.crossJoin(F.broadcast(tot))
        .select(
            "band_lo",
            "n_parts",
            F.col("rev").cast("long").alias("rev_cents"),
            F.floor(share * 1e6 + 0.5).cast("long").alias("rev_share_ppm"),
        )
        .orderBy("band_lo")
    )


SQL_PART_SINGLE_SOURCE_RISK = """
WITH li AS (
  SELECT l_partkey, l_suppkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS rev_cents
  FROM lineitem
),
per_part AS (
  SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers,
         sum(rev_cents) AS rev
  FROM li GROUP BY 1
),
bands AS (
  SELECT CAST(((n_suppliers - 1) // 5) * 5 + 1 AS INT) AS band_lo,
         count(*) AS n_parts,
         sum(rev) AS rev
  FROM per_part GROUP BY 1
),
tot AS (SELECT sum(rev) AS tot FROM bands)
SELECT b.band_lo, CAST(b.n_parts AS BIGINT) AS n_parts,
       CAST(b.rev AS BIGINT) AS rev_cents,
       CAST(CASE WHEN t.tot > 0 THEN
            floor(CAST(b.rev AS DOUBLE) / CAST(t.tot AS DOUBLE) * 1e6 + 0.5)
       END AS BIGINT) AS rev_share_ppm
FROM bands b CROSS JOIN tot t
ORDER BY b.band_lo
"""


QUERIES: dict[str, QuerySpec] = {
    "stats_mcnemar": QuerySpec(q_stats_mcnemar, SQL_STATS_MCNEMAR),
    "stats_cohens_d": QuerySpec(q_stats_cohens_d, SQL_STATS_COHENS_D),
    "orders_tier_migration": QuerySpec(
        q_orders_tier_migration, SQL_ORDERS_TIER_MIGRATION
    ),
    "part_single_source_risk": QuerySpec(
        q_part_single_source_risk, SQL_PART_SINGLE_SOURCE_RISK
    ),
}
