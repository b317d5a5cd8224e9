"""Round-13 batch 51: the trimmed-mean scale path and the
experiment-health statistics battery.

* ``agg_trimmed_mean_bucketed`` — the 100 TB path the r12 verdict
  left documented-but-unimplemented on ``agg_trimmed_mean``: the
  exact per-group rank sort is replaced by a VALUE-GRID rollup
  (group, cents) whose cardinality is bounded by the value domain,
  not the corpus, then the trim boundaries are applied to per-bucket
  cumulative counts.  Same result (equal values are interchangeable
  at the trim boundary), no per-row rank window.
* ``stats_delta_method_ratio`` — ratio-of-sums A/B metric (revenue
  per event, user-level units) with delta-method standard error and
  normal CI — the variance the naive per-event t-test understates.
* ``stats_holm_bonferroni`` — Holm step-down FWER control over the
  same per-type Welch drift p-values as ``stats_bh_fdr`` (shared
  machinery: warehouse30.welch_drift_ps / SQL_WELCH_PS_CTES).
* ``stats_two_proportion_z`` — pooled two-proportion z-test on
  user-level conversion between md5 hash-split arms.
* ``stats_srm_check`` — sample-ratio-mismatch guard: chi-square
  goodness-of-fit of arm exposure counts against the designed 50/50
  split, overall and per event type — the experiment-health check
  run BEFORE reading any effect estimate.
* ``stats_capture_recapture`` — Chapman's capture-recapture estimate
  of the active-user population from the two epoch halves, vs the
  exact distinct count (pure integer arithmetic on both engines).

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; extends SURVEY.md §2.B's aggregation rows and
the LLM-pipeline statistics battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from . import QuerySpec, load_tuned
from .warehouse25 import SQL_EPOCH_MID_CTE, epoch_mid
from .warehouse30 import SQL_WELCH_PS_CTES, welch_drift_ps

_t = load_tuned


# --------------------------------------------------------------------
# bucketed trimmed mean (the agg_trimmed_mean scale path)
# --------------------------------------------------------------------

_TRIM_PCT = 10  # percent trimmed from EACH side (= warehouse33)


def q_agg_trimmed_mean_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-per-side trimmed mean per return flag, computed WITHOUT a
    per-row rank: quantities quantize to integer cents, so the group
    collapses to a (flag, cents) grid bounded by the VALUE DOMAIN
    (l_quantity in [1, 50] -> <= ~4,901 buckets per flag at any
    corpus size).  The trim then runs on per-bucket cumulative
    counts: a bucket spanning cumulative range (cum - c, cum]
    contributes kept = clamp(min(cum, n-k) - max(cum-c, k), >= 0)
    values, k = n*10 DIV 100.  Equal values are interchangeable at
    the trim boundary, so the result is IDENTICAL to the exact-rank
    form (agg_trimmed_mean, warehouse33) — the planted test asserts
    row-for-row equality between the two.

    Scale: one partial-agg groupBy onto the bounded grid + one
    window over the bounded grid partitioned by flag.  This is the
    100 TB plan the r12 scale probe asked for: the exact-rank form
    sorts every row per group (5.4x at 16x data); this form's
    per-row work is one hash-aggregate pass."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_quantity") * 100 + 0.5).cast("long").alias("xq"),
    )
    grid = li.groupBy("g", "xq").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("g")
        .orderBy("xq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = (
        Window.partitionBy("g")
        .orderBy("xq")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = grid.select(
        "g",
        "xq",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    ).withColumn("k", F.expr(f"n * {_TRIM_PCT} DIV 100"))
    kept = F.greatest(
        F.lit(0),
        F.least(F.col("cum"), F.col("n") - F.col("k"))
        - F.greatest(F.col("cum") - F.col("c"), F.col("k")),
    )
    return (
        cum.select(
            "g",
            "n",
            kept.alias("kept"),
            (F.col("xq").cast("decimal(19,0)") * kept).alias("sx"),
        )
        .groupBy("g")
        .agg(
            F.any_value(F.col("n")).alias("n_all"),
            F.sum("kept").alias("n_kept"),
            F.sum("sx").alias("s"),
        )
        .filter(F.col("n_kept") > 0)
        .select(
            F.col("g").alias("l_returnflag"),
            F.col("n_all").cast("long").alias("n_all"),
            F.col("n_kept").cast("long").alias("n_kept"),
            F.expr("CAST(s AS decimal(38,0)) * 1000 DIV n_kept")
            .cast("long")
            .alias("trimmed_mean_cents_milli"),
        )
        .orderBy("l_returnflag")
    )


SQL_AGG_TRIMMED_MEAN_BUCKETED = f"""
WITH li AS (
  SELECT l_returnflag AS g,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS xq
  FROM lineitem
),
grid AS (SELECT g, xq, count(*) AS c FROM li GROUP BY 1, 2),
cum AS (
  SELECT g, xq, c,
         sum(c) OVER (PARTITION BY g ORDER BY xq
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum,
         sum(c) OVER (PARTITION BY g) AS n
  FROM grid
),
kept AS (
  SELECT g, n,
         greatest(0, least(cum, n - n * {_TRIM_PCT} // 100)
                     - greatest(cum - c, n * {_TRIM_PCT} // 100)) AS kept,
         CAST(xq AS HUGEINT)
           * greatest(0, least(cum, n - n * {_TRIM_PCT} // 100)
                         - greatest(cum - c, n * {_TRIM_PCT} // 100)) AS sx
  FROM cum
)
SELECT g AS l_returnflag,
       CAST(any_value(n) AS BIGINT) AS n_all,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST((sum(sx) * 1000) // sum(kept) AS BIGINT)
           AS trimmed_mean_cents_milli
FROM kept GROUP BY g
HAVING sum(kept) > 0
ORDER BY l_returnflag
"""


# --------------------------------------------------------------------
# delta-method ratio metric
# --------------------------------------------------------------------

_DMR_Z = 1.96  # normal 97.5% quantile, embedded as the same literal


def q_stats_delta_method_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-of-sums A/B readout with the delta-method variance:
    the metric is revenue per EVENT, but the randomization unit is
    the USER (md5 hash split, the repo's experiment convention), so
    R = sum(x_u)/sum(y_u) over user-level totals and
    se^2 = n/(n-1) * sum((x_u - R*y_u)^2) / (sum y_u)^2 expanded to
    moment form (Sxx - 2R*Sxy + R^2*Syy; the cross term's mean is 0
    because sum(x) - R*sum(y) == 0).  A per-event t-test would
    understate this variance whenever per-user event counts vary.

    Parity: all six moments per arm are exact integers on the
    decimal rail; R, se, z, CI are staged double ops identical on
    both engines; 1.96 is CAST to DOUBLE in the twin (the decimal-
    literal product trap).

    Scale: one per-user rollup (partial-agg), one per-arm rollup,
    then a 2-row readout — no window, no join."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.col("cents").cast("decimal(28,0)")).alias("ux"),
        F.count(F.lit(1)).alias("uy"),
    )
    arm = (
        md5_long(F.concat(F.col("user_id").cast("string"), F.lit("|dmr42")))
        % 2
    )
    ux_d = F.col("ux").cast("decimal(28,0)")
    uy_d = F.col("uy").cast("decimal(19,0)")
    arms = (
        per_user.select(arm.alias("g"), "ux", "uy")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ux").alias("sx"),
            F.sum("uy").alias("sy"),
            F.sum((ux_d * ux_d).cast("decimal(38,0)")).alias("sxx"),
            F.sum((uy_d * uy_d).cast("decimal(38,0)")).alias("syy"),
            F.sum((ux_d * uy_d).cast("decimal(38,0)")).alias("sxy"),
        )
    )
    wide = arms.agg(
        *[
            F.max(F.when(F.col("g") == g, F.col(c))).alias(f"{c}{g}")
            for g in (0, 1)
            for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
        ]
    )
    lvl1 = wide.select(
        "*",
        (F.col("sx0").cast("double") / F.col("sy0").cast("double")).alias(
            "r0"
        ),
        (F.col("sx1").cast("double") / F.col("sy1").cast("double")).alias(
            "r1"
        ),
    )
    lvl2 = lvl1.select(
        "*",
        (
            F.col("sxx0").cast("double")
            - 2.0 * F.col("r0") * F.col("sxy0").cast("double")
            + F.col("r0") * F.col("r0") * F.col("syy0").cast("double")
        ).alias("d0"),
        (
            F.col("sxx1").cast("double")
            - 2.0 * F.col("r1") * F.col("sxy1").cast("double")
            + F.col("r1") * F.col("r1") * F.col("syy1").cast("double")
        ).alias("d1"),
    )
    lvl3 = lvl2.select(
        "*",
        F.when(
            (F.col("n0") > 1) & (F.col("d0") >= 0),
            F.col("d0")
            * F.col("n0").cast("double")
            / (
                (F.col("n0") - 1).cast("double")
                * F.col("sy0").cast("double")
                * F.col("sy0").cast("double")
            ),
        ).alias("se20"),
        F.when(
            (F.col("n1") > 1) & (F.col("d1") >= 0),
            F.col("d1")
            * F.col("n1").cast("double")
            / (
                (F.col("n1") - 1).cast("double")
                * F.col("sy1").cast("double")
                * F.col("sy1").cast("double")
            ),
        ).alias("se21"),
    )
    lvl4 = lvl3.select(
        "*",
        (F.col("r1") - F.col("r0")).alias("delta"),
        F.when(
            F.col("se20") + F.col("se21") > 0,
            F.sqrt(F.col("se20") + F.col("se21")),
        ).alias("se"),
    )
    # degenerate rail (the stats_two_proportion_z convention): a NULL
    # BIGINT crosses the engine boundary as None-vs-NaN and breaks the
    # driver hash, so an undefined se (an arm with n <= 1, an empty
    # arm, or a negatively-rounded d) yields 0/false SENTINELS plus an
    # explicit flag instead of NULL longs.
    z = F.col("delta") / F.col("se")
    degenerate = F.col("se").isNull()
    delta_ppm = F.floor(F.col("delta") * 1e6 + 0.5).cast("long")
    return lvl4.select(
        F.coalesce(F.col("n0").cast("long"), F.lit(0)).alias("n_users_a"),
        F.coalesce(F.col("n1").cast("long"), F.lit(0)).alias("n_users_b"),
        F.coalesce(
            F.floor(F.col("r0") * 1e6 + 0.5).cast("long"), F.lit(0)
        ).alias("ratio_a_ppm"),
        F.coalesce(
            F.floor(F.col("r1") * 1e6 + 0.5).cast("long"), F.lit(0)
        ).alias("ratio_b_ppm"),
        F.coalesce(delta_ppm, F.lit(0)).alias("delta_ppm"),
        F.when(degenerate, F.lit(0))
        .otherwise(F.floor(F.col("se") * 1e6 + 0.5).cast("long"))
        .alias("se_ppm"),
        F.when(degenerate, F.lit(0))
        .otherwise(F.floor(z * 1000.0 + 0.5).cast("long"))
        .alias("z_milli"),
        F.when(degenerate, F.coalesce(delta_ppm, F.lit(0)))
        .otherwise(
            F.floor(
                (F.col("delta") - F.lit(_DMR_Z) * F.col("se")) * 1e6 + 0.5
            ).cast("long")
        )
        .alias("ci_lo_ppm"),
        F.when(degenerate, F.coalesce(delta_ppm, F.lit(0)))
        .otherwise(
            F.floor(
                (F.col("delta") + F.lit(_DMR_Z) * F.col("se")) * 1e6 + 0.5
            ).cast("long")
        )
        .alias("ci_hi_ppm"),
        F.coalesce(F.abs(z) > F.lit(_DMR_Z), F.lit(False)).alias(
            "significant"
        ),
        degenerate.alias("degenerate"),
    )


SQL_STATS_DELTA_METHOD_RATIO = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
per_user AS (
  SELECT user_id, sum(cents) AS ux, count(*) AS uy FROM ev GROUP BY 1
),
arms AS (
  SELECT CAST(concat('0x', substr(md5(user_id || '|dmr42'), 1, 15))
              AS BIGINT) % 2 AS g,
         count(*) AS n, sum(ux) AS sx, sum(uy) AS sy,
         sum(CAST(ux AS HUGEINT) * ux) AS sxx,
         sum(CAST(uy AS HUGEINT) * uy) AS syy,
         sum(CAST(ux AS HUGEINT) * uy) AS sxy
  FROM per_user GROUP BY 1
),
wide AS (
  SELECT max(CASE WHEN g = 0 THEN n END) AS n0,
         max(CASE WHEN g = 0 THEN sx END) AS sx0,
         max(CASE WHEN g = 0 THEN sy END) AS sy0,
         max(CASE WHEN g = 0 THEN sxx END) AS sxx0,
         max(CASE WHEN g = 0 THEN syy END) AS syy0,
         max(CASE WHEN g = 0 THEN sxy END) AS sxy0,
         max(CASE WHEN g = 1 THEN n END) AS n1,
         max(CASE WHEN g = 1 THEN sx END) AS sx1,
         max(CASE WHEN g = 1 THEN sy END) AS sy1,
         max(CASE WHEN g = 1 THEN sxx END) AS sxx1,
         max(CASE WHEN g = 1 THEN syy END) AS syy1,
         max(CASE WHEN g = 1 THEN sxy END) AS sxy1
  FROM arms
),
lvl1 AS (
  SELECT *,
         CAST(sx0 AS DOUBLE) / CAST(sy0 AS DOUBLE) AS r0,
         CAST(sx1 AS DOUBLE) / CAST(sy1 AS DOUBLE) AS r1
  FROM wide
),
lvl2 AS (
  SELECT *,
         CAST(sxx0 AS DOUBLE) - CAST(2.0 AS DOUBLE) * r0 * CAST(sxy0 AS DOUBLE)
           + r0 * r0 * CAST(syy0 AS DOUBLE) AS d0,
         CAST(sxx1 AS DOUBLE) - CAST(2.0 AS DOUBLE) * r1 * CAST(sxy1 AS DOUBLE)
           + r1 * r1 * CAST(syy1 AS DOUBLE) AS d1
  FROM lvl1
),
lvl3 AS (
  SELECT *,
         CASE WHEN n0 > 1 AND d0 >= 0 THEN
           d0 * CAST(n0 AS DOUBLE)
             / (CAST(n0 - 1 AS DOUBLE) * CAST(sy0 AS DOUBLE)
                * CAST(sy0 AS DOUBLE)) END AS se20,
         CASE WHEN n1 > 1 AND d1 >= 0 THEN
           d1 * CAST(n1 AS DOUBLE)
             / (CAST(n1 - 1 AS DOUBLE) * CAST(sy1 AS DOUBLE)
                * CAST(sy1 AS DOUBLE)) END AS se21
  FROM lvl2
),
lvl4 AS (
  SELECT *,
         r1 - r0 AS delta,
         CASE WHEN se20 + se21 > 0 THEN sqrt(se20 + se21) END AS se
  FROM lvl3
)
SELECT CAST(coalesce(n0, 0) AS BIGINT) AS n_users_a,
       CAST(coalesce(n1, 0) AS BIGINT) AS n_users_b,
       CAST(coalesce(floor(r0 * 1e6 + 0.5), 0) AS BIGINT) AS ratio_a_ppm,
       CAST(coalesce(floor(r1 * 1e6 + 0.5), 0) AS BIGINT) AS ratio_b_ppm,
       CAST(coalesce(floor(delta * 1e6 + 0.5), 0) AS BIGINT) AS delta_ppm,
       CAST(CASE WHEN se IS NULL THEN 0
                 ELSE floor(se * 1e6 + 0.5) END AS BIGINT) AS se_ppm,
       CAST(CASE WHEN se IS NULL THEN 0
                 ELSE floor(delta / se * 1000.0 + 0.5) END AS BIGINT)
           AS z_milli,
       CAST(CASE WHEN se IS NULL THEN coalesce(floor(delta * 1e6 + 0.5), 0)
                 ELSE floor((delta - CAST({_DMR_Z} AS DOUBLE) * se)
                            * 1e6 + 0.5) END AS BIGINT) AS ci_lo_ppm,
       CAST(CASE WHEN se IS NULL THEN coalesce(floor(delta * 1e6 + 0.5), 0)
                 ELSE floor((delta + CAST({_DMR_Z} AS DOUBLE) * se)
                            * 1e6 + 0.5) END AS BIGINT) AS ci_hi_ppm,
       coalesce(abs(delta / se) > CAST({_DMR_Z} AS DOUBLE), false)
           AS significant,
       se IS NULL AS degenerate
FROM lvl4
"""


# --------------------------------------------------------------------
# Holm-Bonferroni step-down
# --------------------------------------------------------------------

_HOLM_ALPHA = 0.05


def q_stats_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down FWER control over the per-type Welch drift
    p-values (the same hypotheses as stats_bh_fdr, which controls
    the weaker FDR): rank p ascending, hypothesis i is rejected iff
    EVERY j <= i satisfies p_j <= alpha / (m - j + 1) — i.e. the
    running max of p_j * (m - j + 1) stays <= alpha.  The adjusted
    p is that running max clamped to 1 (the monotone step-down
    adjustment).

    Parity: shares welch_drift_ps / SQL_WELCH_PS_CTES with
    stats_bh_fdr verbatim; the step products multiply the double p
    by an integer-cast double on both engines, and alpha is CAST to
    DOUBLE in the twin (decimal-literal product trap).

    Scale: the entire readout is windows over the <= |types|-row
    valid frame — bounded by construction (pinned in
    test_plan_audit)."""
    valid = welch_drift_ps(spark, sf_dir)
    w_rank = Window.orderBy("p", "event_type")
    w_run = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_full = w_rank.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = valid.select(
        "event_type",
        "z",
        "p",
        F.row_number().over(w_rank).cast("long").alias("p_rank"),
        F.count(F.lit(1)).over(w_full).alias("m"),
    )
    step = F.col("p") * (F.col("m") - F.col("p_rank") + 1).cast("double")
    runs = ranked.withColumn("runmax", F.max(step).over(w_run))
    return runs.select(
        "event_type",
        F.floor(F.col("z") * 1000.0 + 0.5).cast("long").alias("z_milli"),
        F.floor(F.col("p") * 1e6 + 0.5).cast("long").alias("p_ppm"),
        "p_rank",
        F.col("m").cast("long").alias("m"),
        F.floor(F.least(F.lit(1.0), F.col("runmax")) * 1e6 + 0.5)
        .cast("long")
        .alias("p_holm_ppm"),
        (F.col("runmax") <= F.lit(_HOLM_ALPHA)).alias("rejected"),
    ).orderBy("p_rank")


SQL_STATS_HOLM_BONFERRONI = f"""
WITH {SQL_WELCH_PS_CTES},
mm AS (SELECT count(*) AS m FROM ps),
ranked AS (
  SELECT p.event_type, p.z, p.p, mm.m,
         row_number() OVER (ORDER BY p.p, p.event_type) AS p_rank
  FROM ps p CROSS JOIN mm
),
runs AS (
  SELECT *,
         max(p * CAST(m - p_rank + 1 AS DOUBLE)) OVER (
           ORDER BY p_rank
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
  FROM ranked
)
SELECT event_type,
       CAST(floor(z * 1000.0 + 0.5) AS BIGINT) AS z_milli,
       CAST(floor(p * 1e6 + 0.5) AS BIGINT) AS p_ppm,
       CAST(p_rank AS BIGINT) AS p_rank,
       CAST(m AS BIGINT) AS m,
       CAST(floor(least(CAST(1.0 AS DOUBLE), runmax) * 1e6 + 0.5)
            AS BIGINT) AS p_holm_ppm,
       runmax <= CAST({_HOLM_ALPHA} AS DOUBLE) AS rejected
FROM runs
ORDER BY p_rank
"""


# --------------------------------------------------------------------
# pooled two-proportion z-test
# --------------------------------------------------------------------

_Z_CRIT = 1.96  # normal 97.5% quantile, same literal on both engines


def q_stats_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test on USER-level conversion ("did
    the user ever purchase") between md5 hash-split arms: the
    textbook launch-readout companion to the Welch t
    (agg_ttest_welch, a means test) and the Wilson interval
    (stats_wilson_ci, one arm's uncertainty).
    z = (p1 - p0) / sqrt(p_pool (1 - p_pool) (1/n0 + 1/n1)).

    Parity: conversions and arm sizes are exact integers; the z
    chain is staged double ops identical on both engines; the 1.96
    critical value is CAST to DOUBLE in the twin.

    Scale: one per-user rollup, one 2-row arm rollup — partial aggs
    only."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    arm = (
        md5_long(F.concat(F.col("user_id").cast("string"), F.lit("|2pz42")))
        % 2
    )
    arms = (
        per_user.select(arm.alias("g"), "conv")
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("x"))
    )
    wide = arms.agg(
        F.max(F.when(F.col("g") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("g") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("g") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("g") == 1, F.col("x"))).alias("x1"),
    )
    lvl1 = wide.select(
        "*",
        (F.col("x0").cast("double") / F.col("n0").cast("double")).alias("p0"),
        (F.col("x1").cast("double") / F.col("n1").cast("double")).alias("p1"),
        (
            (F.col("x0") + F.col("x1")).cast("double")
            / (F.col("n0") + F.col("n1")).cast("double")
        ).alias("pp"),
    )
    lvl2 = lvl1.select(
        "*",
        F.when(
            (F.col("pp") > 0) & (F.col("pp") < 1),
            F.sqrt(
                F.col("pp")
                * (F.lit(1.0) - F.col("pp"))
                * (
                    F.lit(1.0) / F.col("n0").cast("double")
                    + F.lit(1.0) / F.col("n1").cast("double")
                )
            ),
        ).alias("se"),
    )
    # degenerate pooled rate (0 or 1: zero variance) -> explicit flag
    # with 0/false sentinels, NOT a NULL bigint (a NULL long crosses
    # the engine boundary as None-vs-NaN and breaks the driver hash)
    z = (F.col("p1") - F.col("p0")) / F.col("se")
    return lvl2.select(
        F.col("n0").cast("long").alias("n_a"),
        F.col("n1").cast("long").alias("n_b"),
        F.col("x0").cast("long").alias("conv_a"),
        F.col("x1").cast("long").alias("conv_b"),
        F.floor(F.col("p0") * 1e6 + 0.5).cast("long").alias("rate_a_ppm"),
        F.floor(F.col("p1") * 1e6 + 0.5).cast("long").alias("rate_b_ppm"),
        F.col("se").isNull().alias("degenerate"),
        F.coalesce(F.floor(z * 1000.0 + 0.5).cast("long"), F.lit(0)).alias(
            "z_milli"
        ),
        F.coalesce(F.abs(z) > F.lit(_Z_CRIT), F.lit(False)).alias(
            "significant"
        ),
    )


SQL_STATS_TWO_PROPORTION_Z = f"""
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
),
arms AS (
  SELECT CAST(concat('0x', substr(md5(user_id || '|2pz42'), 1, 15))
              AS BIGINT) % 2 AS g,
         count(*) AS n, sum(conv) AS x
  FROM per_user GROUP BY 1
),
wide AS (
  SELECT max(CASE WHEN g = 0 THEN n END) AS n0,
         max(CASE WHEN g = 0 THEN x END) AS x0,
         max(CASE WHEN g = 1 THEN n END) AS n1,
         max(CASE WHEN g = 1 THEN x END) AS x1
  FROM arms
),
lvl1 AS (
  SELECT *,
         CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
         CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
         CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS pp
  FROM wide
),
lvl2 AS (
  SELECT *,
         CASE WHEN pp > 0 AND pp < 1 THEN
           sqrt(pp * (CAST(1.0 AS DOUBLE) - pp)
                * (CAST(1.0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                   + CAST(1.0 AS DOUBLE) / CAST(n1 AS DOUBLE))) END AS se
  FROM lvl1
)
SELECT CAST(n0 AS BIGINT) AS n_a,
       CAST(n1 AS BIGINT) AS n_b,
       CAST(x0 AS BIGINT) AS conv_a,
       CAST(x1 AS BIGINT) AS conv_b,
       CAST(floor(p0 * 1e6 + 0.5) AS BIGINT) AS rate_a_ppm,
       CAST(floor(p1 * 1e6 + 0.5) AS BIGINT) AS rate_b_ppm,
       se IS NULL AS degenerate,
       CAST(coalesce(floor((p1 - p0) / se * 1000.0 + 0.5), 0) AS BIGINT)
           AS z_milli,
       coalesce(abs((p1 - p0) / se) > CAST({_Z_CRIT} AS DOUBLE), FALSE)
           AS significant
FROM lvl2
"""


# --------------------------------------------------------------------
# sample-ratio-mismatch guard
# --------------------------------------------------------------------

_CHI2_1DF_05 = 3.841459  # chi-square(1df) 95% quantile, same literal


def q_stats_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch (SRM) guard: chi-square goodness-of-fit
    of user-level arm exposure against the designed 50/50 md5 hash
    split, overall and per event type (exposure = the user has >= 1
    event of that type) — the experiment-health gate every readout
    pipeline runs BEFORE looking at effects.  For two cells,
    chi2 = (n0 - n1)^2 / n.

    Parity: counts are exact integers; the one float op is the final
    division; the 1-df critical value is the same literal on both
    engines (CAST to DOUBLE in the twin).

    Scale: one distinct (user, type) projection + partial-agg
    rollups onto the |types|+1-row readout."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    arm = (
        md5_long(F.concat(F.col("user_id").cast("string"), F.lit("|2pz42")))
        % 2
    )
    ut = ev.distinct().withColumn("g", arm)
    per_type = ut.groupBy("event_type").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("n1"),
    )
    overall = (
        ut.select("user_id", "g")
        .distinct()
        .agg(
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("n1"),
        )
        .select(F.lit("_overall").alias("event_type"), "n0", "n1")
    )
    both = per_type.unionByName(overall)
    d = (F.col("n0") - F.col("n1")).cast("double")
    n = (F.col("n0") + F.col("n1")).cast("double")
    chi2 = F.when(F.col("n0") + F.col("n1") > 0, d * d / n)
    return both.select(
        "event_type",
        F.col("n0").cast("long").alias("n_arm_a"),
        F.col("n1").cast("long").alias("n_arm_b"),
        F.floor(chi2 * 1000.0 + 0.5).cast("long").alias("chi2_milli"),
        (chi2 > F.lit(_CHI2_1DF_05)).alias("srm_detected"),
    ).orderBy("event_type")


SQL_STATS_SRM_CHECK = f"""
WITH ut AS (
  SELECT DISTINCT user_id, event_type,
         CAST(concat('0x', substr(md5(user_id || '|2pz42'), 1, 15))
              AS BIGINT) % 2 AS g
  FROM events
),
per_type AS (
  SELECT event_type,
         sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS n0,
         sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n1
  FROM ut GROUP BY 1
),
overall AS (
  SELECT '_overall' AS event_type,
         sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS n0,
         sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n1
  FROM (SELECT DISTINCT user_id, g FROM ut)
),
both_ AS (SELECT * FROM per_type UNION ALL SELECT * FROM overall)
SELECT event_type,
       CAST(n0 AS BIGINT) AS n_arm_a,
       CAST(n1 AS BIGINT) AS n_arm_b,
       CAST(floor(CASE WHEN n0 + n1 > 0 THEN
                    CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n1 AS DOUBLE)
                      / CAST(n0 + n1 AS DOUBLE) END * 1000.0 + 0.5)
            AS BIGINT) AS chi2_milli,
       CASE WHEN n0 + n1 > 0 THEN
         CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n1 AS DOUBLE)
           / CAST(n0 + n1 AS DOUBLE) END
         > CAST({_CHI2_1DF_05} AS DOUBLE) AS srm_detected
FROM both_
ORDER BY event_type
"""


# --------------------------------------------------------------------
# capture-recapture population estimate
# --------------------------------------------------------------------


def q_stats_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman's capture-recapture estimate of the active-user
    population: the two epoch halves are the two "captures", users
    seen in both are the marked recaptures, and
    N_hat = (n1+1)(n2+1) DIV (m+1) - 1 — the bias-corrected
    Lincoln-Petersen estimator a coverage monitor uses to ask "how
    many users exist that we have NOT seen yet".  Reported against
    the exact distinct-user count with the error in ppm.

    Parity: PURE integer arithmetic end to end — the estimator is an
    integer floor division on both engines (decimal/HUGEINT rail for
    the (n1+1)(n2+1) product).

    Scale: one distinct projection per half off a single events
    pass; the readout is a 1-row fold."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("us")
    )
    mid = epoch_mid(ev)
    halved = ev.crossJoin(F.broadcast(mid)).select(
        "user_id", (F.col("us") <= F.col("mid_us")).alias("in_a")
    )
    per_user = halved.groupBy("user_id").agg(
        F.max(F.when(F.col("in_a"), 1).otherwise(0)).alias("a"),
        F.max(F.when(~F.col("in_a"), 1).otherwise(0)).alias("b"),
    )
    counts = per_user.agg(
        F.sum("a").alias("n1"),
        F.sum("b").alias("n2"),
        F.sum(F.col("a") * F.col("b")).alias("m_both"),
        F.count(F.lit(1)).alias("true_total"),
    )
    est = F.expr(
        "CAST(n1 + 1 AS decimal(38,0)) * CAST(n2 + 1 AS decimal(38,0))"
        " DIV (m_both + 1) - 1"
    ).cast("long")
    return counts.select(
        F.col("n1").cast("long").alias("n_first_half"),
        F.col("n2").cast("long").alias("n_second_half"),
        F.col("m_both").cast("long").alias("n_recaptured"),
        F.col("true_total").cast("long").alias("true_total"),
        est.alias("chapman_est"),
        F.expr(
            "CAST(abs(CAST(n1 + 1 AS decimal(38,0))"
            " * CAST(n2 + 1 AS decimal(38,0)) DIV (m_both + 1) - 1"
            " - true_total) * 1000000 DIV true_total AS BIGINT)"
        ).alias("err_ppm"),
    )


SQL_STATS_CAPTURE_RECAPTURE = f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
{SQL_EPOCH_MID_CTE},
per_user AS (
  SELECT user_id,
         max(CASE WHEN us <= mid.mid_us THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN us > mid.mid_us THEN 1 ELSE 0 END) AS b
  FROM ev, mid GROUP BY 1
),
counts AS (
  SELECT sum(a) AS n1, sum(b) AS n2, sum(a * b) AS m_both,
         count(*) AS true_total
  FROM per_user
)
SELECT CAST(n1 AS BIGINT) AS n_first_half,
       CAST(n2 AS BIGINT) AS n_second_half,
       CAST(m_both AS BIGINT) AS n_recaptured,
       CAST(true_total AS BIGINT) AS true_total,
       CAST((CAST(n1 + 1 AS HUGEINT) * (n2 + 1)) // (m_both + 1) - 1
            AS BIGINT) AS chapman_est,
       CAST(abs((CAST(n1 + 1 AS HUGEINT) * (n2 + 1)) // (m_both + 1) - 1
                - true_total) * 1000000 // true_total AS BIGINT) AS err_ppm
FROM counts
"""


QUERIES: dict[str, QuerySpec] = {
    "stats_two_proportion_z": QuerySpec(
        q_stats_two_proportion_z, SQL_STATS_TWO_PROPORTION_Z
    ),
    "stats_srm_check": QuerySpec(q_stats_srm_check, SQL_STATS_SRM_CHECK),
    "stats_capture_recapture": QuerySpec(
        q_stats_capture_recapture, SQL_STATS_CAPTURE_RECAPTURE
    ),
    "agg_trimmed_mean_bucketed": QuerySpec(
        q_agg_trimmed_mean_bucketed, SQL_AGG_TRIMMED_MEAN_BUCKETED
    ),
    "stats_delta_method_ratio": QuerySpec(
        q_stats_delta_method_ratio, SQL_STATS_DELTA_METHOD_RATIO
    ),
    "stats_holm_bonferroni": QuerySpec(
        q_stats_holm_bonferroni, SQL_STATS_HOLM_BONFERRONI
    ),
}
