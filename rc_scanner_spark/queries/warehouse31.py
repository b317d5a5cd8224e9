"""Round-11 batch 47: sequential and equivalence testing.

* ``stats_sprt_conversion`` — Wald's sequential probability ratio
  test on the daily cumulative purchase-conversion rate: the
  always-valid sequential A/B decision (accept H1 / accept H0 /
  continue) per day, against literal H0/H1 rates.
* ``stats_tost_equivalence`` — two one-sided Welch tests (TOST) for
  EQUIVALENCE of the value metric between the hash-split experiment
  arms: the "no meaningful difference" claim a plain t-test cannot
  make.

Engine-parity: every log-likelihood coefficient and decision boundary
is a Python-precomputed literal embedded identically on both sides
(PARITY.md #9 — never call engine ln/exp); the SPRT statistic is then
pure integer-times-literal arithmetic, and TOST reuses the
Abramowitz-Stegun 26.2.19 polynomial CDF from ``stats_bh_fdr``
(pure + * / and squarings, bit-identical doubles).

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; extends SURVEY.md §2.B's stats category.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned
from .warehouse28 import _US_PER_DAY
from .warehouse30 import _p_two_sided, _sql_p_two_sided

_t = load_tuned


# --------------------------------------------------------------------
# Wald SPRT on daily cumulative conversion
# --------------------------------------------------------------------

# H0: conversion = 0.20, H1: conversion = 0.25, alpha = beta = 0.05.
# The Bernoulli log-likelihood-ratio increments and the Wald decision
# boundaries are PRECOMPUTED literals (repr-exact doubles), so the SQL
# twin embeds the identical numbers and no engine ln is ever called.
_SPRT_P0 = 0.20
_SPRT_P1 = 0.25
_SPRT_C1 = math.log(_SPRT_P1 / _SPRT_P0)  # per-conversion increment
_SPRT_C2 = math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0))  # per-miss
_SPRT_A = math.log(0.95 / 0.05)  # accept-H1 boundary ln((1-b)/a)
_SPRT_B = math.log(0.05 / 0.95)  # accept-H0 boundary ln(b/(1-a))


def q_stats_sprt_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily SPRT trace: cumulative events / purchases per day, the
    Wald log-likelihood ratio llr = k*c1 + (n-k)*c2 with literal c1,
    c2, and the boundary decision — 'accept_h1' once llr >= ln((1-b)/a),
    'accept_h0' once llr <= ln(b/(1-a)), else 'continue'.  The
    sequential decision is what lets an experiment stop EARLY with
    guaranteed error rates.

    Scale: one per-day aggregate, then a cumulative window over the
    per-DAY frame — bounded by calendar length, not event count (the
    allow-listed bounded-window pattern)."""
    ev = _t(spark, sf_dir, "events").select(
        F.expr(f"unix_micros(ts) DIV {_US_PER_DAY}").alias("dnum"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    daily = ev.groupBy("dnum").agg(
        F.count(F.lit(1)).alias("n_d"), F.sum("conv").alias("k_d")
    )
    w = Window.orderBy("dnum").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "dnum",
        F.sum("n_d").over(w).alias("n_cum"),
        F.sum("k_d").over(w).alias("k_cum"),
    )
    llr = F.col("k_cum").cast("double") * F.lit(_SPRT_C1) + (
        F.col("n_cum") - F.col("k_cum")
    ).cast("double") * F.lit(_SPRT_C2)
    return cum.select(
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("dnum").cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
        "n_cum",
        "k_cum",
        F.floor(llr * 1000.0 + 0.5).cast("long").alias("llr_milli"),
        F.when(llr >= F.lit(_SPRT_A), F.lit("accept_h1"))
        .when(llr <= F.lit(_SPRT_B), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    ).orderBy("day")


SQL_STATS_SPRT_CONVERSION = f"""
WITH ev AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS dnum,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events
),
daily AS (
  SELECT dnum, count(*) AS n_d, sum(conv) AS k_d FROM ev GROUP BY dnum
),
cum AS (
  SELECT dnum,
         sum(n_d) OVER (ORDER BY dnum
                        ROWS UNBOUNDED PRECEDING) AS n_cum,
         sum(k_d) OVER (ORDER BY dnum
                        ROWS UNBOUNDED PRECEDING) AS k_cum
  FROM daily
)
SELECT strftime(DATE '1970-01-01' + CAST(dnum AS INTEGER), '%Y-%m-%d') AS day,
       CAST(n_cum AS BIGINT) AS n_cum,
       CAST(k_cum AS BIGINT) AS k_cum,
       CAST(floor((CAST(k_cum AS DOUBLE) * {_SPRT_C1!r}
                   + CAST(n_cum - k_cum AS DOUBLE) * {_SPRT_C2!r})
                  * 1000.0 + 0.5) AS BIGINT) AS llr_milli,
       CASE WHEN CAST(k_cum AS DOUBLE) * {_SPRT_C1!r}
                 + CAST(n_cum - k_cum AS DOUBLE) * {_SPRT_C2!r}
                 >= {_SPRT_A!r} THEN 'accept_h1'
            WHEN CAST(k_cum AS DOUBLE) * {_SPRT_C1!r}
                 + CAST(n_cum - k_cum AS DOUBLE) * {_SPRT_C2!r}
                 <= {_SPRT_B!r} THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM cum
ORDER BY day
"""


# --------------------------------------------------------------------
# TOST equivalence between experiment arms
# --------------------------------------------------------------------

_TOST_MARGIN = 0.10  # equivalence margin on the value metric (units)
_TOST_ALPHA = 0.05


def q_stats_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two one-sided Welch tests for equivalence of mean value between
    the md5 hash-split arms (the shared ab_bucket_col split): with
    diff = mean_c - mean_t and margin d, z_lo = (diff + d)/se tests
    diff <= -d, z_hi = (diff - d)/se tests diff >= d, and the TOST p
    is max(upper_p(z_lo), lower_p(z_hi)) — equivalence is claimed when
    it is <= alpha.  One-sided tails come from the shared A&S
    polynomial (upper_p(z) = p_two(|z|)/2 mirrored across zero), so p
    hashes bit-exactly.  Moments fold as exact integer cents (the
    agg_ttest_welch recipe); degenerate arms (n < 2 or zero pooled
    variance) yield NULL p and NULL verdict on BOTH engines.

    Scale: map-side assignment, one two-group aggregate, a 1-row
    closed-form readout."""
    from .warehouse3 import ab_bucket_col

    ev = _t(spark, sf_dir, "events")
    assigned = ev.select(
        F.when(ab_bucket_col() < 500, F.lit("c")).otherwise(F.lit("t")).alias(
            "arm"
        ),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("x"),
    )
    m = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(28,0)")).alias("s1"),
        F.sum(
            (F.col("x").cast("decimal(19,0)") * F.col("x")).cast("decimal(38,0)")
        ).alias("s2"),
    )
    one = m.groupBy().agg(
        F.max(F.when(F.col("arm") == "c", F.col("n"))).alias("nc"),
        F.max(F.when(F.col("arm") == "c", F.col("s1"))).alias("sc1"),
        F.max(F.when(F.col("arm") == "c", F.col("s2"))).alias("sc2"),
        F.max(F.when(F.col("arm") == "t", F.col("n"))).alias("nt"),
        F.max(F.when(F.col("arm") == "t", F.col("s1"))).alias("st1"),
        F.max(F.when(F.col("arm") == "t", F.col("s2"))).alias("st2"),
    )
    sc1 = F.col("sc1").cast("double")
    sc2 = F.col("sc2").cast("double")
    st1 = F.col("st1").cast("double")
    st2 = F.col("st2").cast("double")
    # STAGED named columns: inlining the moment subtree into the A&S
    # polynomial (which references its argument ~40 times) exploded
    # the Catalyst expression tree — analysis alone took ~57 s at
    # sf0.01 (16x scale probe, round 11).  Each select below collapses
    # a level to an attribute, so every later reference is one node.
    staged = one.select(
        "nc",
        "nt",
        (sc1 / F.col("nc") / 100.0).alias("mc"),
        (st1 / F.col("nt") / 100.0).alias("mt"),
        F.when(
            F.col("nc") > 1,
            (sc2 - sc1 * sc1 / F.col("nc")) / (F.col("nc") - 1) / 10000.0,
        ).alias("vc"),
        F.when(
            F.col("nt") > 1,
            (st2 - st1 * st1 / F.col("nt")) / (F.col("nt") - 1) / 10000.0,
        ).alias("vt"),
    )
    staged = staged.withColumn(
        "se2", F.col("vc") / F.col("nc") + F.col("vt") / F.col("nt")
    )
    staged = staged.withColumn(
        "se", F.when(F.col("se2") > 0, F.sqrt(F.col("se2")))
    ).withColumn("diff", F.col("mc") - F.col("mt"))
    staged = staged.withColumn(
        "z_lo", (F.col("diff") + F.lit(_TOST_MARGIN)) / F.col("se")
    ).withColumn("z_hi", (F.col("diff") - F.lit(_TOST_MARGIN)) / F.col("se"))
    # p_two(|z|) once per z as a named column; the sign branch then
    # references the attribute, not the polynomial tree
    staged = staged.withColumn(
        "pt_lo", _p_two_sided(F.abs(F.col("z_lo")))
    ).withColumn("pt_hi", _p_two_sided(F.abs(F.col("z_hi"))))

    def upper_p(z: str, pt: str) -> F.Column:
        # P(Z >= z), mirrored across zero via the two-sided polynomial
        return F.when(F.col(z) >= 0, F.col(pt) / 2.0).otherwise(
            F.lit(1.0) - F.col(pt) / 2.0
        )

    staged = staged.withColumn(
        "p_lo", upper_p("z_lo", "pt_lo")  # tests diff <= -margin
    ).withColumn(
        "p_hi", F.lit(1.0) - upper_p("z_hi", "pt_hi")  # tests diff >= margin
    )
    p_tost = F.greatest(F.col("p_lo"), F.col("p_hi"))
    return staged.select(
        F.col("nc").alias("n_control"),
        F.col("nt").alias("n_treatment"),
        F.floor(F.col("diff") * 1000.0 + 0.5).cast("long").alias("diff_milli"),
        F.floor(F.col("z_lo") * 1000.0 + 0.5).cast("long").alias("z_lo_milli"),
        F.floor(F.col("z_hi") * 1000.0 + 0.5).cast("long").alias("z_hi_milli"),
        F.floor(p_tost * 1000000.0 + 0.5).cast("long").alias("p_tost_ppm"),
        F.when(p_tost.isNotNull(), p_tost <= F.lit(_TOST_ALPHA)).alias(
            "equivalent"
        ),
    )


def _sql_upper_p(z: str) -> str:
    return (
        f"CASE WHEN {z} >= 0 THEN ({_sql_p_two_sided(f'({z})')}) / 2.0"
        f" ELSE 1.0 - ({_sql_p_two_sided(f'(-({z}))')}) / 2.0 END"
    )


def _tost_sql() -> str:
    from .warehouse3 import SQL_AB_BUCKET

    mc = "(CAST(sc1 AS DOUBLE) / nc / 100.0)"
    mt = "(CAST(st1 AS DOUBLE) / nt / 100.0)"
    vc = (
        "(CASE WHEN nc > 1 THEN (CAST(sc2 AS DOUBLE)"
        " - CAST(sc1 AS DOUBLE) * CAST(sc1 AS DOUBLE) / nc)"
        " / (nc - 1) / 10000.0 END)"
    )
    vt = (
        "(CASE WHEN nt > 1 THEN (CAST(st2 AS DOUBLE)"
        " - CAST(st1 AS DOUBLE) * CAST(st1 AS DOUBLE) / nt)"
        " / (nt - 1) / 10000.0 END)"
    )
    se = f"(CASE WHEN {vc} / nc + {vt} / nt > 0 THEN sqrt({vc} / nc + {vt} / nt) END)"
    diff = f"({mc} - {mt})"
    z_lo = f"(({diff} + {_TOST_MARGIN!r}) / {se})"
    z_hi = f"(({diff} - {_TOST_MARGIN!r}) / {se})"
    p_lo = _sql_upper_p(z_lo)
    p_hi = f"(1.0 - ({_sql_upper_p(z_hi)}))"
    p = f"greatest(({p_lo}), {p_hi})"
    return f"""
WITH assigned AS (
  SELECT CASE WHEN ({SQL_AB_BUCKET}) < 500 THEN 'c' ELSE 't' END AS arm,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
),
m AS (
  SELECT arm, count(*) AS n, sum(x) AS s1,
         sum(CAST(x AS HUGEINT) * x) AS s2
  FROM assigned GROUP BY arm
),
one AS (
  SELECT max(CASE WHEN arm = 'c' THEN n END) AS nc,
         max(CASE WHEN arm = 'c' THEN s1 END) AS sc1,
         max(CASE WHEN arm = 'c' THEN s2 END) AS sc2,
         max(CASE WHEN arm = 't' THEN n END) AS nt,
         max(CASE WHEN arm = 't' THEN s1 END) AS st1,
         max(CASE WHEN arm = 't' THEN s2 END) AS st2
  FROM m
)
SELECT CAST(nc AS BIGINT) AS n_control,
       CAST(nt AS BIGINT) AS n_treatment,
       CAST(floor({diff} * 1000.0 + 0.5) AS BIGINT) AS diff_milli,
       CAST(floor({z_lo} * 1000.0 + 0.5) AS BIGINT) AS z_lo_milli,
       CAST(floor({z_hi} * 1000.0 + 0.5) AS BIGINT) AS z_hi_milli,
       CAST(floor({p} * 1000000.0 + 0.5) AS BIGINT) AS p_tost_ppm,
       CASE WHEN {p} IS NOT NULL THEN {p} <= {_TOST_ALPHA!r} END AS equivalent
FROM one
"""


QUERIES: dict[str, QuerySpec] = {
    "stats_sprt_conversion": QuerySpec(
        q_stats_sprt_conversion, SQL_STATS_SPRT_CONVERSION
    ),
    "stats_tost_equivalence": QuerySpec(q_stats_tost_equivalence, _tost_sql()),
}
