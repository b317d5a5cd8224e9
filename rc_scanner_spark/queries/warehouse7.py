"""Round-6 batch 15: per-group OLS regression, growth accounting,
session path mining, and Wilson proportion intervals.

Why these belong in a 100 TB training-data engine:

* ``stats_ols_group`` — closed-form per-group simple regression
  (slope / intercept / R^2) is the workhorse "does X drive Y within
  each segment" answer (discount elasticity here).  It is ONE
  grouped aggregate of five exact integer sums — no ML library, no
  iteration, no shuffle beyond the group-by.
* ``events_growth_accounting`` — the standard growth decomposition
  (new / retained / resurrected / churned per week) every
  product-health dashboard runs.  All state transitions come from
  per-user lag/lead windows (partitioned by user — never global) on
  the deduplicated (user, week) frame.
* ``events_top_paths`` — top event-type paths over sessionized
  streams (the "what do users do first" mining query).  Sessions
  come from the gap rule via a per-user window; the path string is
  an ORDER-pinned aggregate over the first five steps, so results
  are deterministic on both engines.
* ``stats_wilson_ci`` — the Wilson score interval is the right
  binomial CI at any n (unlike the normal approximation); per-source
  pass-rate intervals gate corpus inclusion decisions.  One grouped
  aggregate plus an identical scalar chain per row.

Engine-parity notes: weeks are epoch-day DIV 7 integers (Monday
anchor 1970-01-05) — engine-neutral where date_trunc('week') nuances
and ISO-week keying have bitten before; regression/CI outputs are
double chains over EXACT integer sums (decimal(38,0) on Spark,
HUGEINT in the twin) evaluated in the identical literal order with
zero-variance guards as when()/NULLIF; path strings are built from
rank-bounded rows with ORDER-pinned string aggregation on both
sides.

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; these extend SURVEY.md §2.B's warehouse /
stats categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned

_t = load_tuned


# --------------------------------------------------------------------
# per-group closed-form OLS (discount elasticity by brand)
# --------------------------------------------------------------------


def q_stats_ols_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS of quantity on discount percentage points:
    slope / intercept / R^2 from the closed form over exact integer
    sums (x = discount in integer percent, y = quantity units).

    Scale: one broadcast dim join (part is the small side) + one
    grouped aggregate; the five moment sums ride decimal(38,0)
    (sum of rank-free integer products — exact at any row count),
    and only the final slope/R^2 chain is double, identical on both
    engines, with the zero-variance degenerate case guarded."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias("x"),
        F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("y"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    d = F.col
    moments = (
        li.join(
            F.broadcast(part),
            li.l_partkey == part.p_partkey,
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(d("x").cast("decimal(38,0)")).alias("sx"),
            F.sum(d("y").cast("decimal(38,0)")).alias("sy"),
            F.sum(
                (d("x").cast("decimal(38,0)") * d("x")).cast("decimal(38,0)")
            ).alias("sxx"),
            F.sum(
                (d("y").cast("decimal(38,0)") * d("y")).cast("decimal(38,0)")
            ).alias("syy"),
            F.sum(
                (d("x").cast("decimal(38,0)") * d("y")).cast("decimal(38,0)")
            ).alias("sxy"),
        )
    )
    nd = d("n").cast("double")
    sx, sy = d("sx").cast("double"), d("sy").cast("double")
    sxx, syy, sxy = (
        d("sxx").cast("double"),
        d("syy").cast("double"),
        d("sxy").cast("double"),
    )
    den_x = nd * sxx - sx * sx
    den_y = nd * syy - sy * sy
    num = nd * sxy - sx * sy
    slope = num / den_x
    return moments.select(
        "p_brand",
        "n",
        F.when(
            den_x > 0.0,
            F.floor(slope * 1000000.0).cast("bigint"),
        ).alias("slope_micro"),
        F.when(
            den_x > 0.0,
            F.floor((sy - slope * sx) / nd * 1000.0).cast("bigint"),
        ).alias("intercept_milli"),
        F.when(
            (den_x > 0.0) & (den_y > 0.0),
            F.floor(num * num / (den_x * den_y) * 1000000.0).cast("bigint"),
        ).alias("r2_ppm"),
    ).orderBy("p_brand")


SQL_STATS_OLS_GROUP = """
WITH pts AS (
  SELECT p.p_brand,
         CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT) AS x,
         CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
m AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM pts GROUP BY 1
)
SELECT p_brand, n,
  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0 THEN
    CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * 1000000.0) AS BIGINT)
  END AS slope_micro,
  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0 THEN
    CAST(floor((CAST(sy AS DOUBLE)
                - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) * 1000.0) AS BIGINT)
  END AS intercept_milli,
  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
        AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0 THEN
    CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               * 1000000.0) AS BIGINT)
  END AS r2_ppm
FROM m ORDER BY p_brand
"""


# --------------------------------------------------------------------
# weekly growth accounting (new / retained / resurrected / churned)
# --------------------------------------------------------------------

# Monday-anchored epoch-day week index: engine-neutral where
# date_trunc('week') / ISO-week keying differ in edge semantics.
_WK_EPOCH = "1970-01-05"


def q_events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting over event actors: per week, how many
    active users are new (first-ever week), retained (also active the
    prior week), resurrected (active before, but not the prior week);
    plus how many of the PRIOR week's actives churned (not active
    this week).  Counts satisfy active(w) = new + retained +
    resurrected and churned(w) = active(w-1) - retained(w).

    Scale: events collapse to the distinct (user, week) frame first;
    every window (first week, lag week) partitions BY USER; the
    reporting rollup is one grouped aggregate over that frame.  The
    global max-week scalar (to stop churn reporting past the horizon)
    is a broadcast 1-row frame."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            f"datediff(to_date(ts), date'{_WK_EPOCH}') DIV 7"
        ).alias("wk"),
    )
    uw = ev.filter(F.col("wk").isNotNull()).distinct()
    mxw = uw.agg(F.max("wk").alias("mxwk"))
    w = Window.partitionBy("user_id").orderBy("wk")
    flagged = (
        uw.withColumn("first_wk", F.min("wk").over(w))
        .withColumn("prev_wk", F.lag("wk").over(w))
        .withColumn("next_wk", F.lead("wk").over(w))
    )
    states = flagged.crossJoin(F.broadcast(mxw)).select(
        "wk",
        F.when(F.col("wk") == F.col("first_wk"), 1).otherwise(0).alias(
            "is_new"
        ),
        F.when(F.col("prev_wk") == F.col("wk") - 1, 1).otherwise(0).alias(
            "is_retained"
        ),
        F.when(
            F.col("prev_wk").isNotNull()
            & (F.col("prev_wk") < F.col("wk") - 1),
            1,
        ).otherwise(0).alias("is_resurrected"),
        # churn is attributed to week wk+1 (the week they went dark)
        F.when(
            (
                F.col("next_wk").isNull()
                | (F.col("next_wk") > F.col("wk") + 1)
            )
            & (F.col("wk") < F.col("mxwk")),
            1,
        ).otherwise(0).alias("churns_next"),
    )
    per_wk = states.groupBy("wk").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum("is_new").alias("n_new"),
        F.sum("is_retained").alias("n_retained"),
        F.sum("is_resurrected").alias("n_resurrected"),
        F.sum("churns_next").alias("churn_out"),
    )
    churn = per_wk.filter(F.col("churn_out") > 0).select(
        (F.col("wk") + 1).alias("wk"), F.col("churn_out").alias("n_churned")
    )
    # FULL join: a week can carry churn with zero actives (everyone
    # went dark) — a left join would silently drop those churn counts
    # (review-round fix, r6).
    return (
        per_wk.join(churn, "wk", "full_outer")
        .select(
            "wk",
            F.date_format(
                F.date_add(
                    F.lit(_WK_EPOCH).cast("date"),
                    (F.col("wk") * 7).cast("int"),
                ),
                "yyyy-MM-dd",
            ).alias("week_start"),
            F.coalesce("n_active", F.lit(0)).alias("n_active"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0)).alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
        .orderBy("wk")
    )


SQL_EVENTS_GROWTH_ACCOUNTING = f"""
WITH uw AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '{_WK_EPOCH}', CAST(ts AS DATE)) // 7 AS wk
  FROM events WHERE ts IS NOT NULL
),
mxw AS (SELECT max(wk) AS mxwk FROM uw),
flagged AS (
  SELECT user_id, wk,
         min(wk) OVER (PARTITION BY user_id) AS first_wk,
         lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
         lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
  FROM uw
),
states AS (
  SELECT wk,
         CASE WHEN wk = first_wk THEN 1 ELSE 0 END AS is_new,
         CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END AS is_retained,
         CASE WHEN prev_wk IS NOT NULL AND prev_wk < wk - 1
              THEN 1 ELSE 0 END AS is_resurrected,
         CASE WHEN (next_wk IS NULL OR next_wk > wk + 1)
                   AND wk < mxw.mxwk
              THEN 1 ELSE 0 END AS churns_next
  FROM flagged CROSS JOIN mxw
),
per_wk AS (
  SELECT wk, count(*) AS n_active, sum(is_new) AS n_new,
         sum(is_retained) AS n_retained,
         sum(is_resurrected) AS n_resurrected,
         sum(churns_next) AS churn_out
  FROM states GROUP BY 1
)
SELECT COALESCE(p.wk, c.wk) AS wk,
       strftime(DATE '{_WK_EPOCH}'
                + CAST(COALESCE(p.wk, c.wk) * 7 AS INT), '%Y-%m-%d')
         AS week_start,
       CAST(COALESCE(p.n_active, 0) AS BIGINT) AS n_active,
       CAST(COALESCE(p.n_new, 0) AS BIGINT) AS n_new,
       CAST(COALESCE(p.n_retained, 0) AS BIGINT) AS n_retained,
       CAST(COALESCE(p.n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(COALESCE(c.churn_out, 0) AS BIGINT) AS n_churned
FROM per_wk p
FULL JOIN (SELECT wk + 1 AS wk, churn_out FROM per_wk
           WHERE churn_out > 0) c ON c.wk = p.wk
ORDER BY wk
"""


# --------------------------------------------------------------------
# top session paths (first-5-steps event-type sequences)
# --------------------------------------------------------------------

_PATH_GAP_S = 1800
_PATH_STEPS = 5
_PATH_TOPK = 20


def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type paths: sessionize per user on a 30-minute gap,
    take each session's first five events in (ts, event_id) order,
    join the types with '>' and count the most common paths.

    Scale: sessionization and the step rank are per-user windows
    (never global); the rank filter bounds every session's
    contribution to five rows BEFORE the path aggregate; top-k plans
    as TakeOrderedAndProject.  The path string is ORDER-pinned on
    both engines (array_sort on (rank, type) structs vs string_agg
    ORDER BY rank)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).filter(F.col("ts").isNotNull())
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(wu))
        .withColumn(
            "brk",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.unix_timestamp("ts")
                    - F.unix_timestamp("prev_ts")
                    > _PATH_GAP_S
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("sess", F.sum("brk").over(wu))
    )
    ws = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    steps = (
        sess.withColumn("rnk", F.row_number().over(ws))
        .filter(F.col("rnk") <= _PATH_STEPS)
    )
    paths = (
        steps.groupBy("user_id", "sess")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(rnk, event_type))), s -> s.event_type), '>')"
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(_PATH_TOPK)
    )


SQL_EVENTS_TOP_PATHS = f"""
WITH ev AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE ts IS NOT NULL
),
sess0 AS (
  SELECT *,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts)
                      > {_PATH_GAP_S}
              THEN 1 ELSE 0 END AS brk
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess
  FROM sess0
),
steps AS (
  SELECT user_id, sess, event_type,
         row_number() OVER (PARTITION BY user_id, sess
                            ORDER BY ts, event_id) AS rnk
  FROM sess
),
paths AS (
  SELECT user_id, sess,
         string_agg(event_type, '>' ORDER BY rnk) AS path
  FROM steps WHERE rnk <= {_PATH_STEPS}
  GROUP BY 1, 2
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY 1
ORDER BY n_sessions DESC, path LIMIT {_PATH_TOPK}
"""


# --------------------------------------------------------------------
# Wilson score interval per source (binomial pass rate)
# --------------------------------------------------------------------

_WILSON_Z = "1.96"
_WILSON_MIN_CHARS = 300


def q_stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 95% Wilson score interval for the share of documents
    with at least 300 chars (the binomial CI that stays valid at
    small n and extreme rates, unlike the normal approximation).

    Scale: one grouped aggregate; the interval is a per-row scalar
    chain over exact counts — identical literal order both engines."""
    z = _WILSON_Z
    docs = _t(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("n_chars") >= _WILSON_MIN_CHARS, 1).otherwise(0).alias(
            "pass"
        ),
    )
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pass").alias("k")
    )
    expr_lo = (
        f"floor(((k / cast(n as double) + {z} * {z} / (2.0 * n))"
        f" - {z} * sqrt(k / cast(n as double)"
        f" * (1.0 - k / cast(n as double)) / n"
        f" + {z} * {z} / (4.0 * n * n)))"
        f" / (1.0 + {z} * {z} / n) * 1000000.0)"
    )
    expr_hi = expr_lo.replace(f"- {z} * sqrt", f"+ {z} * sqrt")
    return agg.select(
        "source",
        "n",
        "k",
        F.expr(expr_lo).cast("bigint").alias("lo_ppm"),
        F.expr(expr_hi).cast("bigint").alias("hi_ppm"),
    ).orderBy("source")


SQL_STATS_WILSON_CI = f"""
WITH agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN n_chars >= {_WILSON_MIN_CHARS}
                       THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM documents GROUP BY 1
)
SELECT source, n, k,
  CAST(floor(((k / CAST(n AS DOUBLE) + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n))
              - {_WILSON_Z} * sqrt(k / CAST(n AS DOUBLE)
                * (1.0 - k / CAST(n AS DOUBLE)) / n
                + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
             / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n) * 1000000.0)
       AS BIGINT) AS lo_ppm,
  CAST(floor(((k / CAST(n AS DOUBLE) + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n))
              + {_WILSON_Z} * sqrt(k / CAST(n AS DOUBLE)
                * (1.0 - k / CAST(n AS DOUBLE)) / n
                + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
             / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n) * 1000000.0)
       AS BIGINT) AS hi_ppm
FROM agg ORDER BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "stats_ols_group": QuerySpec(q_stats_ols_group, SQL_STATS_OLS_GROUP),
    "events_growth_accounting": QuerySpec(
        q_events_growth_accounting, SQL_EVENTS_GROWTH_ACCOUNTING
    ),
    "events_top_paths": QuerySpec(q_events_top_paths, SQL_EVENTS_TOP_PATHS),
    "stats_wilson_ci": QuerySpec(q_stats_wilson_ci, SQL_STATS_WILSON_CI),
}
