"""Round-10 batch 39: k-group statistics and engagement analytics.

* ``stats_anova_oneway`` — one-way ANOVA F across return-flag groups
  on integer-cent quantities: the k-group generalization of the Welch
  pair test already in the registry.
* ``stats_levene_brown_forsythe`` — Brown-Forsythe variance-
  homogeneity W (the ANOVA F applied to |x - group median|): the
  gatekeeper check before trusting a pooled-variance ANOVA.
* ``stats_kruskal_wallis`` — tie-corrected Kruskal-Wallis H across
  the event-type populations (the k-group Mann-Whitney, reusing its
  bucketed two-phase global-rank machinery).
* ``events_poisson_rate_ratio`` — per-type pre/post event-rate change
  around the epoch midpoint with the variance-stabilizing
  2*(sqrt(n2)-sqrt(n1)) z statistic (equal exposure halves).
* ``events_dau_mau_stickiness`` — per-day DAU / trailing-28-day MAU
  ratio (the classic engagement "stickiness" metric).
* ``events_power_user_curve`` — per-month histogram of active-days
  per user (the L28/power-user curve growth teams read).
* ``part_sales_churn`` — year-over-year assortment churn: parts with
  sales in year Y but none in Y+1.

Engine-parity: every cross-group reduction folds INTEGER moments
(cents, half-cents, doubled ranks, integer quotients via DIV // —
both engines truncate toward zero) so no float sum ever crosses a
group boundary; only the final one-row scalar chain drops to doubles,
written identically on both sides (sqrt is correctly rounded, so
bit-identical from integer inputs).  Degenerate inputs (k < 2, zero
within-group variance, zero pre-period counts, all-values-tied) yield
NULL on BOTH engines — never an ANSI throw.

Design-scale bound (documented, mirrors stats_mann_whitney): the
integer second moments ride decimal(38,0)/HUGEINT; a group whose
cent-sum squared passes ~1e38 (≈3e9 rows of max-cent values) throws
loudly under ANSI.  Quotients are a separate hazard: Spark's decimal
DIV silently WRAPS past 2^63 (review r10, empirically verified), so
every big quotient goes through ``checked_div_sql``'s assert_true
guard — a loud runtime error, never a silent cross-engine
divergence.

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; extends SURVEY.md §2.B's stats/events
categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned
from .warehouse25 import SQL_EPOCH_MID_CTE, epoch_mid

_t = load_tuned

# Spark's decimal DIV returns a BIGINT that silently WRAPS modulo 2^64
# once the true quotient passes long range (empirically verified on
# Spark 4 ANSI: CAST('2e19' AS decimal(38,0)) DIV 1 returns a wrapped
# value, no error), while the DuckDB twins stay exact in HUGEINT.
# Every big-decimal quotient below goes through this guard, which
# turns the wrap regime into the loud runtime error the design-scale
# notes promise.  Callers must structurally exclude b <= 0.
_LONG_DIV_SAFE = 9.0e18  # < 2^63-1 with double-rounding margin


def checked_div_sql(a: str, b: str) -> str:
    """``a DIV b`` (both integral-valued SQL expressions, b > 0) with
    an assert_true overflow guard on the quotient magnitude."""
    return (
        f"CASE WHEN assert_true(CAST({a} AS DOUBLE)"
        f" < {_LONG_DIV_SAFE} * CAST({b} AS DOUBLE),"
        f" 'integer quotient exceeds bigint range') IS NULL"
        f" THEN ({a}) DIV ({b}) END"
    )


# --------------------------------------------------------------------
# shared integer one-way-ANOVA fold (used by ANOVA + Brown-Forsythe)
# --------------------------------------------------------------------


def _anova_readout(vals: DataFrame, stat_alias: str) -> DataFrame:
    """One-way ANOVA F from a ``(g, v)`` integer-valued frame.

    Per group: integer moments (n, s = Σv as BIGINT, q = Σv² as
    decimal(38,0)) and the integer quotient s² DIV n.  The cross-group
    fold then sums only integers (order-independent — a float sum
    across group rows would be association-order-dependent between
    engines).  SSB = Σ(s_g² DIV n_g) - (S² DIV N) clamped at 0 (the
    two floors can undershoot by <k when the group means coincide);
    SSW = Σq - Σ(s_g² DIV n_g) is >= 0 by construction.  Only the
    final F = (SSB/(k-1)) / (SSW/(N-k)) is a double chain."""
    per = (
        vals.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(
                F.col("v").cast("decimal(19,0)") * F.col("v").cast("decimal(19,0)")
            ).alias("q"),
        )
        .withColumn(
            "sq_over_n",
            F.expr(
                checked_div_sql(
                    "CAST(s AS decimal(19,0)) * CAST(s AS decimal(19,0))", "n"
                )
            ),
        )
    )
    fold = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nr"),
        F.sum("s").alias("st"),
        F.sum(F.col("sq_over_n").cast("decimal(38,0)")).alias("ssb_q"),
        F.sum(F.col("q") - F.col("sq_over_n")).alias("ssw"),
    ).withColumn(
        "ssb",
        F.greatest(
            F.col("ssb_q")
            - F.expr(
                checked_div_sql(
                    "CAST(st AS decimal(19,0)) * CAST(st AS decimal(19,0))",
                    "nr",
                )
            ),
            F.lit(0).cast("decimal(38,0)"),
        ),
    )
    kd = F.col("k").cast("double")
    nd = F.col("nr").cast("double")
    ssb_d = F.col("ssb").cast("double")
    ssw_d = F.col("ssw").cast("double")
    f_stat = (ssb_d / (kd - 1.0)) / (ssw_d / (nd - kd))
    return fold.select(
        F.col("k").alias("n_groups"),
        F.col("nr").alias("n_rows"),
        F.when(
            (F.col("k") >= 2) & (F.col("nr") > F.col("k")) & (F.col("ssw") > 0),
            F.floor(f_stat * 1000.0 + 0.5),
        )
        .cast("long")
        .alias(stat_alias),
        F.when(
            (F.col("ssb") + F.col("ssw")) > 0,
            F.floor(ssb_d / (ssb_d + ssw_d) * 1e6 + 0.5),
        )
        .cast("long")
        .alias("eta_sq_ppm"),
    )


def _sql_anova_readout(vals_cte: str, stat_alias: str) -> str:
    """DuckDB twin of ``_anova_readout`` over a ``vals(g, v)`` CTE."""
    return f"""
WITH {vals_cte},
per AS (
  SELECT g, count(*) AS n, CAST(sum(v) AS BIGINT) AS s,
         sum(CAST(v AS HUGEINT) * v) AS q,
         (CAST(sum(v) AS HUGEINT) * CAST(sum(v) AS BIGINT)) // count(*)
             AS sq_over_n
  FROM vals GROUP BY g
),
fold AS (
  SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nr,
         CAST(sum(s) AS BIGINT) AS st,
         sum(sq_over_n) AS ssb_q, sum(q - sq_over_n) AS ssw
  FROM per
),
clamped AS (
  SELECT k, nr, ssw,
         greatest(ssb_q - (CAST(st AS HUGEINT) * st) // nr,
                  0::HUGEINT) AS ssb
  FROM fold
)
SELECT CAST(k AS BIGINT) AS n_groups, nr AS n_rows,
       CASE WHEN k >= 2 AND nr > k AND ssw > 0
            THEN CAST(floor((CAST(ssb AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
                            / (CAST(ssw AS DOUBLE)
                               / (CAST(nr AS DOUBLE) - CAST(k AS DOUBLE)))
                            * 1000.0 + 0.5) AS BIGINT)
       END AS {stat_alias},
       CASE WHEN (ssb + ssw) > 0
            THEN CAST(floor(CAST(ssb AS DOUBLE)
                            / (CAST(ssb AS DOUBLE) + CAST(ssw AS DOUBLE))
                            * 1e6 + 0.5) AS BIGINT)
       END AS eta_sq_ppm
FROM clamped
"""


def q_stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic for quantity cents across the three
    return-flag populations (1 row): does mean quantity differ by
    flag?  Scale: one per-group integer-moment aggregate + a k-row
    fold — no windows, no joins."""
    vals = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_quantity") * 100 + 0.5).cast("long").alias("v"),
    )
    return _anova_readout(vals, "f_milli")


SQL_STATS_ANOVA_ONEWAY = _sql_anova_readout(
    """vals AS (
  SELECT l_returnflag AS g,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS v
  FROM lineitem
)""",
    "f_milli",
)


def q_stats_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity W across the return-flag
    groups: the one-way ANOVA F applied to |x - median_g| deviations
    (median-based Levene — robust to non-normality).  Deviations ride
    half-cent integers: 2*median of an integer column is an exact
    integer on both engines (the interpolated midpoint doubles away),
    so z = |2v - 2*med_g| never touches a float.  Scale: one exact
    per-group percentile aggregate (3 rows, broadcast back) + the
    ANOVA fold."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_quantity") * 100 + 0.5).cast("long").alias("v"),
    )
    med = li.groupBy("g").agg(
        (F.percentile(F.col("v"), F.lit(0.5)) * 2).cast("long").alias("med2")
    )
    vals = li.join(F.broadcast(med), "g").select(
        "g", F.abs(2 * F.col("v") - F.col("med2")).alias("v")
    )
    return _anova_readout(vals, "bf_w_milli")


SQL_STATS_LEVENE_BF = _sql_anova_readout(
    """li AS (
  SELECT l_returnflag AS g,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS v
  FROM lineitem
),
med AS (
  SELECT g, CAST(quantile_cont(v, 0.5) * 2 AS BIGINT) AS med2
  FROM li GROUP BY g
),
vals AS (
  SELECT li.g, abs(2 * li.v - med.med2) AS v
  FROM li JOIN med USING (g)
)""",
    "bf_w_milli",
)


# --------------------------------------------------------------------
# Kruskal-Wallis (k-group rank test, Mann-Whitney's bucket machinery)
# --------------------------------------------------------------------

_KW_BUCKETS = 512


def q_stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H across ALL event-type
    populations on ``value`` (1 row) — the k-group Mann-Whitney.

    Global doubled average ranks without a global sort (the
    stats_mann_whitney machinery): tie groups aggregate per distinct
    value, values land in <=512 range buckets from a broadcast min/max
    scalar, bucket offsets are a bounded 512-row window, the
    within-bucket running sum stays partitioned by bucket.  Per-group
    doubled rank sums R2_g ride decimal(38,0); the cross-group
    reduction sums the INTEGER quotients R2_g² DIV (4*n_g) (identical
    truncation both engines, <1 absolute error each) so group order
    never matters.  H = 12/(N(N+1)) * Σ - 3(N+1), tie-corrected by
    1 - Σ(t³-t)/(N³-N); all-tied input (correction 0) yields NULL.

    Design-scale bound: R2_g² passes decimal(38,0) once a group holds
    ~3e9 rows — a loud ANSI throw, mirroring stats_mann_whitney.

    NULL values are excluded explicitly (a rank has no meaning for an
    unobserved value): a NULL tie-group would land in the top range
    bucket on both engines (least() skips NULL) but sort FIRST in
    Spark's within-bucket window and LAST in DuckDB's — shifting
    every rank in that bucket between the twins — while its rows
    vanish from per_g (the vt-ranks value equi-join never matches
    NULL) yet still count in n and the tie fold."""
    ev = (
        _t(spark, sf_dir, "events")
        .select("value", "event_type")
        .filter(F.col("value").isNotNull())
    )
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    # tie groups per distinct value, with per-group counts alongside
    vt = ev.groupBy("value", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    v = (
        vt.groupBy("value")
        .agg(F.sum("cnt").alias("t"))
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "bucket",
            F.when(
                F.col("hi") > F.col("lo"),
                F.least(
                    F.lit(_KW_BUCKETS - 1),
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / (F.col("hi") - F.col("lo"))
                        * _KW_BUCKETS
                    ).cast("int"),
                ),
            ).otherwise(F.lit(0)),
        )
    )
    boff = (
        v.groupBy("bucket")
        .agg(F.sum("t").alias("bt"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("bt").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    wb = Window.partitionBy("bucket").orderBy("value")
    ranks = (
        v.join(F.broadcast(boff), "bucket")
        .withColumn("run", F.sum("t").over(wb))
        .withColumn("n_less", F.col("offset") + F.col("run") - F.col("t"))
        .withColumn("r2", 2 * F.col("n_less") + F.col("t") + 1)
        .select("value", "t", "r2")
    )
    per_g = (
        vt.join(ranks, "value")
        .groupBy("event_type")
        .agg(
            F.sum("cnt").alias("n_g"),
            F.sum(
                (F.col("cnt").cast("decimal(38,0)") * F.col("r2")).cast(
                    "decimal(38,0)"
                )
            ).alias("r2_g"),
        )
        .withColumn(
            "qt", F.expr(checked_div_sql("r2_g * r2_g", "4 * n_g"))
        )
    )
    ties = ranks.agg(
        F.sum(
            (
                F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
                - F.col("t")
            ).cast("decimal(38,0)")
        ).alias("tie")
    )
    fold = per_g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum(F.col("qt").cast("decimal(38,0)")).alias("qsum"),
    ).crossJoin(F.broadcast(ties))
    nd = F.col("n").cast("double")
    h = 12.0 / (nd * (nd + 1.0)) * F.col("qsum").cast("double") - 3.0 * (nd + 1.0)
    corr = 1.0 - F.col("tie").cast("double") / (nd * nd * nd - nd)
    return fold.select(
        F.col("k").alias("n_groups"),
        F.col("n").alias("n_rows"),
        F.col("tie").cast("long").alias("tie_term"),
        F.when((F.col("k") >= 2) & (F.col("n") > 1), F.floor(h * 1000.0 + 0.5))
        .cast("long")
        .alias("h_milli"),
        F.when(
            (F.col("k") >= 2) & (F.col("n") > 1) & (corr > 0.0),
            F.floor(h / corr * 1000.0 + 0.5),
        )
        .cast("long")
        .alias("h_corr_milli"),
    )


SQL_STATS_KRUSKAL_WALLIS = f"""
WITH ev AS (SELECT value, event_type FROM events WHERE value IS NOT NULL),
bounds AS (SELECT min(value) AS lo, max(value) AS hi FROM ev),
vt AS (SELECT value, event_type, count(*) AS cnt
       FROM ev GROUP BY 1, 2),
v AS (
  SELECT value, t,
         CASE WHEN hi > lo
              THEN least({_KW_BUCKETS - 1},
                         CAST(floor((value - lo) / (hi - lo)
                                    * {_KW_BUCKETS}) AS INTEGER))
              ELSE 0 END AS bucket
  FROM (SELECT value, CAST(sum(cnt) AS BIGINT) AS t
        FROM vt GROUP BY value) CROSS JOIN bounds
),
boff AS (
  SELECT bucket,
         coalesce(sum(bt) OVER (ORDER BY bucket
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS off
  FROM (SELECT bucket, CAST(sum(t) AS BIGINT) AS bt
        FROM v GROUP BY bucket)
),
ranks AS (
  SELECT value, t,
         2 * (off + CAST(sum(t) OVER (PARTITION BY v.bucket
                                      ORDER BY value) AS BIGINT) - t)
             + t + 1 AS r2
  FROM v JOIN boff USING (bucket)
),
per_g AS (
  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_g,
         sum(CAST(cnt AS HUGEINT) * r2) AS r2_g
  FROM vt JOIN ranks USING (value)
  GROUP BY event_type
),
qf AS (
  SELECT event_type, n_g, (r2_g * r2_g) // (4 * CAST(n_g AS HUGEINT)) AS qt
  FROM per_g
),
ties AS (
  SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS tie FROM ranks
),
fold AS (
  SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n, sum(qt) AS qsum
  FROM qf
)
SELECT CAST(k AS BIGINT) AS n_groups, n AS n_rows,
       CAST(tie AS BIGINT) AS tie_term,
       CASE WHEN k >= 2 AND n > 1
            THEN CAST(floor((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                             * CAST(qsum AS DOUBLE)
                             - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                            * 1000.0 + 0.5) AS BIGINT)
       END AS h_milli,
       CASE WHEN k >= 2 AND n > 1
             AND (1.0 - CAST(tie AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     - CAST(n AS DOUBLE))) > 0.0
            THEN CAST(floor((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                             * CAST(qsum AS DOUBLE)
                             - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                            / (1.0 - CAST(tie AS DOUBLE)
                               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                  * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
                            * 1000.0 + 0.5) AS BIGINT)
       END AS h_corr_milli
FROM fold CROSS JOIN ties
"""


# --------------------------------------------------------------------
# pre/post Poisson rate ratio
# --------------------------------------------------------------------


def q_events_poisson_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event-rate change across the epoch midpoint (equal
    exposure halves): rate ratio in ppm plus the variance-stabilizing
    z = 2*(sqrt(n_post) - sqrt(n_pre)) — the standard square-root
    transform test for Poisson counts.  sqrt of an exact integer is
    correctly rounded on both engines, so z hashes exactly.  Scale:
    one per-type conditional-count aggregate under a broadcast 1-row
    midpoint scalar."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    mid = epoch_mid(ev)
    per = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("us") <= F.col("mid_us"), 1).otherwise(0)
            ).alias("n_pre"),
            F.sum(
                F.when(F.col("us") > F.col("mid_us"), 1).otherwise(0)
            ).alias("n_post"),
        )
    )
    z = 2.0 * (
        F.sqrt(F.col("n_post").cast("double")) - F.sqrt(F.col("n_pre").cast("double"))
    )
    return per.select(
        "event_type",
        "n_pre",
        "n_post",
        F.when(
            F.col("n_pre") > 0,
            F.expr(
                checked_div_sql(
                    "CAST(n_post AS decimal(19,0)) * 1000000", "n_pre"
                )
            ),
        )
        .cast("long")
        .alias("rate_ratio_ppm"),
        F.floor(z * 1000.0 + 0.5).cast("long").alias("z_milli"),
    ).orderBy("event_type")


SQL_EVENTS_POISSON_RATE_RATIO = f"""
WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
{SQL_EPOCH_MID_CTE},
per AS (
  SELECT event_type,
         CAST(sum(CASE WHEN e.us <= m.mid_us THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pre,
         CAST(sum(CASE WHEN e.us > m.mid_us THEN 1 ELSE 0 END) AS BIGINT)
             AS n_post
  FROM ev e CROSS JOIN mid m
  GROUP BY event_type
)
SELECT event_type, n_pre, n_post,
       CASE WHEN n_pre > 0
            THEN CAST((CAST(n_post AS HUGEINT) * 1000000) // n_pre AS BIGINT)
       END AS rate_ratio_ppm,
       CAST(floor(2.0 * (sqrt(CAST(n_post AS DOUBLE))
                         - sqrt(CAST(n_pre AS DOUBLE))) * 1000.0 + 0.5)
            AS BIGINT) AS z_milli
FROM per
ORDER BY event_type
"""


# --------------------------------------------------------------------
# DAU / trailing-28-day MAU stickiness
# --------------------------------------------------------------------

_US_PER_DAY = 86_400_000_000


def q_events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day DAU / trailing-28-day MAU "stickiness" (ppm).  The
    trailing distinct count avoids any sliding-window state: each
    (user, active-day) row fans out to the 28 target days it supports
    (a bounded explode — 28 rows per user-day), then one distinct
    aggregate per target day; target days with no activity of their
    own drop out via the DAU inner join, so no day-spine bounds scalar
    is needed.  Scale: linear in user-days, shuffles on day keys."""
    ud = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(f"unix_micros(ts) DIV {_US_PER_DAY}").alias("dnum"),
        )
        .distinct()
    )
    dau = ud.groupBy("dnum").agg(F.count(F.lit(1)).alias("dau"))
    fan = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("dnum"), F.col("dnum") + 27)).alias("t"),
    )
    mau = fan.groupBy("t").agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.join(mau, dau["dnum"] == mau["t"])
        .select(
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("dnum").cast("int")),
                "yyyy-MM-dd",
            ).alias("day"),
            "dau",
            "mau",
            F.expr(
                "CAST(dau AS decimal(19,0)) * 1000000 DIV mau"
            ).alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


SQL_EVENTS_DAU_MAU_STICKINESS = f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS dnum
  FROM events
),
dau AS (SELECT dnum, count(*) AS dau FROM ud GROUP BY dnum),
fan AS (
  SELECT user_id, unnest(range(dnum, dnum + 28)) AS t FROM ud
),
mau AS (SELECT t, count(DISTINCT user_id) AS mau FROM fan GROUP BY t)
SELECT strftime(DATE '1970-01-01' + CAST(dnum AS INTEGER), '%Y-%m-%d') AS day,
       CAST(dau AS BIGINT) AS dau, CAST(mau AS BIGINT) AS mau,
       CAST((CAST(dau AS HUGEINT) * 1000000) // mau AS BIGINT) AS stickiness_ppm
FROM dau JOIN mau ON dau.dnum = mau.t
ORDER BY day
"""


def q_events_power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user curve: per calendar month, the histogram of
    active-days-per-user (how many users were active exactly d days
    that month) — the L28 engagement distribution.  Two hash
    aggregates, no windows."""
    ev = _t(spark, sf_dir, "events").select(
        F.date_format(F.col("ts"), "yyyy-MM").alias("month"),
        "user_id",
        F.expr(f"unix_micros(ts) DIV {_US_PER_DAY}").alias("dnum"),
    )
    per_user = ev.groupBy("month", "user_id").agg(
        F.countDistinct("dnum").alias("active_days")
    )
    return (
        per_user.groupBy("month", "active_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("month", "active_days")
    )


SQL_EVENTS_POWER_USER_CURVE = f"""
WITH ev AS (
  SELECT strftime(ts, '%Y-%m') AS month, user_id,
         CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS dnum
  FROM events
),
per_user AS (
  SELECT month, user_id, CAST(count(DISTINCT dnum) AS BIGINT) AS active_days
  FROM ev GROUP BY month, user_id
)
SELECT month, active_days, count(*) AS n_users
FROM per_user
GROUP BY month, active_days
ORDER BY month, active_days
"""


# --------------------------------------------------------------------
# year-over-year assortment churn
# --------------------------------------------------------------------


def q_part_sales_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year assortment churn: per year Y, how many parts
    sold in Y had NO sales in Y+1 (churned), as a share of Y's active
    assortment.  One distinct (part, year) frame consumed twice (the
    Y side and the anti side of a left-anti self-join on (part, Y+1))
    — both shuffles hash on the part key.  The max year is excluded
    (its Y+1 is unobserved, not churned)."""
    py = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", F.year(F.col("l_shipdate")).cast("int").alias("yr"))
        .distinct()
    )
    nxt = py.select("l_partkey", (F.col("yr") - 1).alias("yr"))
    churned = py.join(nxt, ["l_partkey", "yr"], "left_anti")
    bounds = py.agg(F.max("yr").alias("max_yr"))
    active = py.groupBy("yr").agg(F.count(F.lit(1)).alias("n_active"))
    churn = churned.groupBy("yr").agg(F.count(F.lit(1)).alias("n_churned"))
    return (
        active.join(churn, "yr", "left")
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("yr") < F.col("max_yr"))
        .select(
            "yr",
            "n_active",
            F.coalesce(F.col("n_churned"), F.lit(0)).alias("n_churned"),
            F.expr(
                "CAST(coalesce(n_churned, 0) AS decimal(19,0)) * 1000000"
                " DIV n_active"
            ).alias("churn_ppm"),
        )
        .orderBy("yr")
    )


SQL_PART_SALES_CHURN = """
WITH py AS (
  SELECT DISTINCT l_partkey, CAST(year(l_shipdate) AS INTEGER) AS yr
  FROM lineitem
),
churned AS (
  SELECT a.l_partkey, a.yr
  FROM py a ANTI JOIN py b
    ON a.l_partkey = b.l_partkey AND b.yr = a.yr + 1
),
active AS (SELECT yr, count(*) AS n_active FROM py GROUP BY yr),
churn AS (SELECT yr, count(*) AS n_churned FROM churned GROUP BY yr),
bounds AS (SELECT max(yr) AS max_yr FROM py)
SELECT a.yr, a.n_active,
       CAST(coalesce(c.n_churned, 0) AS BIGINT) AS n_churned,
       CAST((CAST(coalesce(c.n_churned, 0) AS HUGEINT) * 1000000)
            // a.n_active AS BIGINT) AS churn_ppm
FROM active a LEFT JOIN churn c ON a.yr = c.yr
CROSS JOIN bounds
WHERE a.yr < max_yr
ORDER BY a.yr
"""


QUERIES: dict[str, QuerySpec] = {
    "stats_anova_oneway": QuerySpec(q_stats_anova_oneway, SQL_STATS_ANOVA_ONEWAY),
    "stats_levene_brown_forsythe": QuerySpec(
        q_stats_levene_brown_forsythe, SQL_STATS_LEVENE_BF
    ),
    "stats_kruskal_wallis": QuerySpec(
        q_stats_kruskal_wallis, SQL_STATS_KRUSKAL_WALLIS
    ),
    "events_poisson_rate_ratio": QuerySpec(
        q_events_poisson_rate_ratio, SQL_EVENTS_POISSON_RATE_RATIO
    ),
    "events_dau_mau_stickiness": QuerySpec(
        q_events_dau_mau_stickiness, SQL_EVENTS_DAU_MAU_STICKINESS
    ),
    "events_power_user_curve": QuerySpec(
        q_events_power_user_curve, SQL_EVENTS_POWER_USER_CURVE
    ),
    "part_sales_churn": QuerySpec(q_part_sales_churn, SQL_PART_SALES_CHURN),
}


# --------------------------------------------------------------------
# first -> second purchase latency
# --------------------------------------------------------------------


def q_orders_repeat_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between a customer's FIRST and SECOND order, quartiled per
    market segment — the repeat-purchase velocity readout next to the
    cohort-LTV and retention views.  Two co-partitioned aggregates on
    the customer key (first-order min, then conditional second-order
    min over the strictly-later orders; same-instant duplicates count
    as one), integer day gaps, one exact per-segment quantile
    aggregate.  No windows — the per-customer min-of-later beats a
    row_number sort at scale (map-side partial agg)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.unix_micros(F.col("o_orderdate")).alias("us")
    )
    first = o.groupBy("o_custkey").agg(F.min("us").alias("first_us"))
    second = (
        o.join(first, "o_custkey")
        .filter(F.col("us") > F.col("first_us"))
        .groupBy("o_custkey", "first_us")
        .agg(F.min("us").alias("second_us"))
    )
    lat = second.selectExpr(
        "o_custkey",
        f"(second_us - first_us) DIV {_US_PER_DAY} AS lat_days",
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        lat.join(c, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_repeat"),
            F.round(F.percentile(F.col("lat_days"), F.lit(0.25)), 4).alias("q1_days"),
            F.round(F.percentile(F.col("lat_days"), F.lit(0.5)), 4).alias("med_days"),
            F.round(F.percentile(F.col("lat_days"), F.lit(0.75)), 4).alias("q3_days"),
        )
        .orderBy("c_mktsegment")
    )


SQL_ORDERS_REPEAT_PURCHASE_LATENCY = f"""
WITH o AS (SELECT o_custkey, epoch_us(o_orderdate) AS us FROM orders),
first AS (SELECT o_custkey, min(us) AS first_us FROM o GROUP BY o_custkey),
second AS (
  SELECT o.o_custkey, first_us, min(us) AS second_us
  FROM o JOIN first USING (o_custkey)
  WHERE us > first_us
  GROUP BY o.o_custkey, first_us
),
lat AS (
  SELECT o_custkey, (second_us - first_us) // {_US_PER_DAY} AS lat_days
  FROM second
)
SELECT c_mktsegment, count(*) AS n_repeat,
       round(quantile_cont(lat_days, 0.25), 4) AS q1_days,
       round(quantile_cont(lat_days, 0.5), 4) AS med_days,
       round(quantile_cont(lat_days, 0.75), 4) AS q3_days
FROM lat JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES["orders_repeat_purchase_latency"] = QuerySpec(
    q_orders_repeat_purchase_latency, SQL_ORDERS_REPEAT_PURCHASE_LATENCY
)


# --------------------------------------------------------------------
# Fano-factor burstiness per event type
# --------------------------------------------------------------------


def q_events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance / mean) of DAILY event counts per type
    over the zero-filled calendar spine: ~1 means Poisson-like arrival,
    >1 means bursty, <1 regular — the one-number burstiness screen for
    every rate-anomaly threshold downstream.  Population variance from
    integer day-count moments (counts, not floats, cross the groupBy);
    Fano = (n*q - s²) / (n*s) as one identical double chain; all-zero
    types (s = 0) are NULL on both engines."""
    from .warehouse2 import filled_day_spine

    f = filled_day_spine(spark, sf_dir)
    per = f.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cnt").alias("total"),
        F.sum(
            F.col("cnt").cast("decimal(19,0)") * F.col("cnt").cast("decimal(19,0)")
        ).alias("q"),
    )
    nd = F.col("n_days").cast("double")
    sd = F.col("total").cast("double")
    qd = F.col("q").cast("double")
    fano = (nd * qd - sd * sd) / (nd * sd)
    return per.select(
        "event_type",
        "n_days",
        "total",
        F.when(F.col("total") > 0, F.floor(fano * 1000.0 + 0.5))
        .cast("long")
        .alias("fano_milli"),
    ).orderBy("event_type")


def _fano_sql() -> str:
    from .warehouse2 import SQL_DAY_SPINE_CTE

    return f"""
WITH {SQL_DAY_SPINE_CTE},
per AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(cnt) AS BIGINT) AS total,
         sum(CAST(cnt AS HUGEINT) * cnt) AS q
  FROM filled GROUP BY event_type
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days, total,
       CASE WHEN total > 0
            THEN CAST(floor((CAST(n_days AS DOUBLE) * CAST(q AS DOUBLE)
                             - CAST(total AS DOUBLE) * CAST(total AS DOUBLE))
                            / (CAST(n_days AS DOUBLE) * CAST(total AS DOUBLE))
                            * 1000.0 + 0.5) AS BIGINT)
       END AS fano_milli
FROM per
ORDER BY event_type
"""


# --------------------------------------------------------------------
# Wald-Wolfowitz runs test on daily revenue direction
# --------------------------------------------------------------------


def q_stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the up/down direction of day-over-
    day total order revenue (1 row): too FEW runs means trending /
    autocorrelated days, too MANY means oscillation — the classic
    randomness screen before fitting any i.i.d.-assuming model.

    Day revenues ride integer cents; zero-change days are dropped (the
    standard treatment).  Both lag windows are unpartitioned but run
    over the per-DAY aggregate — bounded by calendar length, not order
    count (allowlisted, the seq_global_row_number precedent).  The
    z statistic folds from integer (n_up, n_down, n_runs) in one
    identical double chain; single-direction series (sigma² = 0)
    yield NULL on both engines."""
    o = _t(spark, sf_dir, "orders").select(
        F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias("day"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    daily = o.groupBy("day").agg(F.sum("cents").alias("rev"))
    w = Window.orderBy("day")
    chg = (
        daily.withColumn("prev", F.lag("rev").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("rev") != F.col("prev")))
        .withColumn("up", F.when(F.col("rev") > F.col("prev"), 1).otherwise(0))
    )
    runs = chg.withColumn("prev_up", F.lag("up").over(w)).select(
        "up",
        F.when(
            F.col("prev_up").isNull() | (F.col("up") != F.col("prev_up")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    fold = runs.agg(
        F.sum("up").alias("n_up"),
        F.sum(1 - F.col("up")).alias("n_down"),
        F.sum("new_run").alias("n_runs"),
    )
    n1 = F.col("n_up").cast("double")
    n2 = F.col("n_down").cast("double")
    nn = n1 + n2
    mu = 2.0 * n1 * n2 / nn + 1.0
    sigma2 = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) / (nn * nn * (nn - 1.0))
    )
    return fold.select(
        "n_up",
        "n_down",
        "n_runs",
        # n_up + n_down > 2 rules out sigma2 == 0 exactly: with
        # n1,n2 >= 1 and N > 2, 2*n1*n2 >= 2(N-1) > N (review r10 —
        # the 1-up/1-down series made Spark throw DIVIDE_BY_ZERO
        # where the twin returned NULL)
        F.when(
            (F.col("n_up") > 0)
            & (F.col("n_down") > 0)
            & (F.col("n_up") + F.col("n_down") > 2),
            F.floor(
                (F.col("n_runs").cast("double") - mu) / F.sqrt(sigma2) * 1000.0
                + 0.5
            ),
        )
        .cast("long")
        .alias("z_milli"),
    )


SQL_STATS_RUNS_TEST = """
WITH o AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
daily AS (SELECT day, CAST(sum(cents) AS BIGINT) AS rev
          FROM o GROUP BY day),
chg AS (
  SELECT day, rev, prev,
         CASE WHEN rev > prev THEN 1 ELSE 0 END AS up
  FROM (SELECT day, rev, lag(rev) OVER (ORDER BY day) AS prev FROM daily)
  WHERE prev IS NOT NULL AND rev <> prev
),
runs AS (
  SELECT up,
         CASE WHEN prev_up IS NULL OR up <> prev_up THEN 1 ELSE 0 END
             AS new_run
  FROM (SELECT up, lag(up) OVER (ORDER BY day) AS prev_up FROM chg)
),
fold AS (
  SELECT CAST(sum(up) AS BIGINT) AS n_up,
         CAST(sum(1 - up) AS BIGINT) AS n_down,
         CAST(sum(new_run) AS BIGINT) AS n_runs
  FROM runs
)
SELECT n_up, n_down, n_runs,
       CASE WHEN n_up > 0 AND n_down > 0 AND n_up + n_down > 2
            THEN CAST(floor((CAST(n_runs AS DOUBLE)
                             - (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                                / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                                + 1.0))
                            / sqrt(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                                   * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                                      - (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)))
                                   / ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                                      * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                                      * ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                                         - 1.0)))
                            * 1000.0 + 0.5) AS BIGINT)
       END AS z_milli
FROM fold
"""


QUERIES["events_burstiness_fano"] = QuerySpec(q_events_burstiness_fano, _fano_sql())
QUERIES["stats_runs_test"] = QuerySpec(q_stats_runs_test, SQL_STATS_RUNS_TEST)


# --------------------------------------------------------------------
# Friedman test (within-day ranks across event types)
# --------------------------------------------------------------------


def q_stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test across event types blocked by DAY (1 row): do the
    k types differ in daily volume once every day is its own block —
    the repeated-measures companion to Kruskal-Wallis (which ignores
    the day pairing).  Ranks are within-day over the zero-filled
    spine, so every block holds all k types.

    Within-day average ranks without windows: the spine self-joins on
    the day key (k rows vs k rows — k^2 per day, bounded by the type
    count, never by event volume), doubled ranks r2 = 2*n_less + t + 1
    stay integers under ties.  Q = 3*sum(R2_j^2)/(n*k*(k+1)) -
    3*n*(k+1) folds from one exact decimal sum (no per-group division
    at all); the tie correction divides by 1 - sum(t^3-t)/(n*k*(k^2-1))
    and an all-tied spine (correction 0) yields NULL on both
    engines."""
    from .warehouse2 import filled_day_spine

    f = filled_day_spine(spark, sf_dir)
    a = f.select(
        F.col("event_type").alias("et"), F.col("day").alias("d"),
        F.col("cnt").alias("c"),
    )
    b = f.select(
        F.col("event_type").alias("et2"), F.col("day").alias("d"),
        F.col("cnt").alias("c2"),
    )
    ranked = (
        a.join(b, "d")
        .groupBy("et", "d")
        .agg(
            (
                2 * F.sum(F.when(F.col("c2") < F.col("c"), 1).otherwise(0))
                + F.sum(F.when(F.col("c2") == F.col("c"), 1).otherwise(0))
                + 1
            ).alias("r2")
        )
    )
    per_type = ranked.groupBy("et").agg(
        F.sum("r2").alias("r2_j"), F.count(F.lit(1)).alias("n_days")
    )
    ties = (
        f.groupBy("day", "cnt")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                (
                    F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
                    - F.col("t")
                ).cast("decimal(38,0)")
            ).alias("tie")
        )
    )
    fold = per_type.agg(
        F.count(F.lit(1)).alias("k"),
        F.max("n_days").alias("n"),
        F.sum(
            F.col("r2_j").cast("decimal(19,0)") * F.col("r2_j").cast("decimal(19,0)")
        ).alias("qsum"),
    ).crossJoin(F.broadcast(ties))
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    # qsum carries DOUBLED rank sums squared = 4 * sum(R_j^2), so the
    # 12/(nk(k+1)) classical factor becomes 3/(nk(k+1))
    q = (
        3.0 * F.col("qsum").cast("double") / (nd * kd * (kd + 1.0))
        - 3.0 * nd * (kd + 1.0)
    )
    corr = 1.0 - F.col("tie").cast("double") / (nd * kd * (kd * kd - 1.0))
    return fold.select(
        F.col("n").alias("n_days"),
        F.col("k").alias("n_types"),
        F.col("tie").cast("long").alias("tie_term"),
        F.when((F.col("k") >= 2) & (F.col("n") >= 1), F.floor(q * 1000.0 + 0.5))
        .cast("long")
        .alias("q_milli"),
        F.when(
            (F.col("k") >= 2) & (F.col("n") >= 1) & (corr > 0.0),
            F.floor(q / corr * 1000.0 + 0.5),
        )
        .cast("long")
        .alias("q_corr_milli"),
    )


def _friedman_sql() -> str:
    from .warehouse2 import SQL_DAY_SPINE_CTE

    return f"""
WITH {SQL_DAY_SPINE_CTE},
ranked AS (
  SELECT a.event_type AS et, a.day AS d,
         2 * sum(CASE WHEN b.cnt < a.cnt THEN 1 ELSE 0 END)
         + sum(CASE WHEN b.cnt = a.cnt THEN 1 ELSE 0 END) + 1 AS r2
  FROM filled a JOIN filled b ON a.day = b.day
  GROUP BY a.event_type, a.day
),
per_type AS (
  SELECT et, CAST(sum(r2) AS BIGINT) AS r2_j, count(*) AS n_days
  FROM ranked GROUP BY et
),
ties AS (
  SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS tie FROM (
    SELECT day, cnt, count(*) AS t FROM filled GROUP BY day, cnt
  )
),
fold AS (
  SELECT count(*) AS k, CAST(max(n_days) AS BIGINT) AS n,
         sum(CAST(r2_j AS HUGEINT) * r2_j) AS qsum
  FROM per_type
),
stat AS (
  SELECT k, n, tie,
         3.0 * CAST(qsum AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
         - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0) AS q,
         1.0 - CAST(tie AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
            * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)) AS corr
  FROM fold CROSS JOIN ties
)
SELECT n AS n_days, CAST(k AS BIGINT) AS n_types,
       CAST(tie AS BIGINT) AS tie_term,
       CASE WHEN k >= 2 AND n >= 1
            THEN CAST(floor(q * 1000.0 + 0.5) AS BIGINT)
       END AS q_milli,
       CASE WHEN k >= 2 AND n >= 1 AND corr > 0.0
            THEN CAST(floor(q / corr * 1000.0 + 0.5) AS BIGINT)
       END AS q_corr_milli
FROM stat
"""


QUERIES["stats_friedman"] = QuerySpec(q_stats_friedman, _friedman_sql())
