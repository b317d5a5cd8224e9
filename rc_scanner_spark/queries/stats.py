"""Round-6 statistical monitoring / drift-detection operators: binned
two-sample KS drift, chi-square independence, Welch's t, per-source
Jensen-Shannon divergence, CUSUM changepoint scan, and tolerance-bounded
as-of joins.

Why these belong in a 100 TB training-data engine: a continuously
refreshed corpus needs DISTRIBUTION-level regression tests, not just
row counts — KS answers "did the value distribution drift between
segments", chi-square answers "are type and time-of-week still
independent", JSD answers "which source's vocabulary is drifting from
the corpus", CUSUM localizes WHEN a daily rate shifted, and Welch's t
is the A/B primitive.  All are one or two hash aggregates plus bounded
windows.

Float discipline (the lesson of earlier rounds): every statistic that
sums per-item float terms integer-izes the TERM (ppm/ppb via
floor(x*K + 0.5)) and sums integers — integer sums are
associativity-free, so partial aggregation order can never drift the
result between engines or cluster sizes.  Statistics composed from
whole-group moments (t, chi-square cells) compute each term in one
closed-form float expression — identical operation order on both
engines — before integer-izing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned

_t = load_tuned


# --------------------------------------------------------------------
# binned two-sample Kolmogorov-Smirnov drift
# --------------------------------------------------------------------


def _binned_cdf_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Shared click-vs-purchase binned-CDF chain for the KS and
    Cramer-von Mises drift statistics — one definition on the PySpark
    side mirroring the twins' shared _SQL_BINNED_CDF_CTES body.
    Returns (cum, totals): cum carries bin/nc/np/cc/cp (KS prunes the
    per-bin counts it doesn't use; Catalyst drops them from the scan),
    totals is the 1-row tc/tp frame the callers broadcast."""
    ev = _t(spark, sf_dir, "events")
    # NULL values are excluded explicitly: a NULL bin would sort FIRST
    # in Spark's window (NULLS FIRST default) but LAST in DuckDB,
    # shifting every CDF prefix between the twins.
    two = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .filter(F.col("value").isNotNull())
        .select(
            F.floor(F.col("value") * 10).cast("long").alias("bin"),
            F.col("event_type").alias("t"),
        )
    )
    per_bin = two.groupBy("bin").agg(
        F.sum(F.when(F.col("t") == "click", 1).otherwise(0)).alias("nc"),
        F.sum(F.when(F.col("t") == "purchase", 1).otherwise(0)).alias("np"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_bin.select(
        "bin",
        "nc",
        "np",
        F.sum("nc").over(w).alias("cc"),
        F.sum("np").over(w).alias("cp"),
    )
    totals = per_bin.agg(F.sum("nc").alias("tc"), F.sum("np").alias("tp"))
    return cum, totals


def q_agg_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample KS statistic between the click and purchase
    value distributions: bin values to a 0.1-wide grid, build both
    empirical CDFs over the shared bin axis, take the max absolute
    CDF gap (in ppm).

    Scale: one hash aggregate to per-bin counts (conditional sums fold
    both series into one row per bin), then ONE window over the bin
    axis — bounded by the value domain (~5k bins for values <= 500),
    NOT by row count, the same bounded-cardinality pattern as
    select_token_budget (allowlisted in tests/test_plan_audit.py).
    Integer ppm arithmetic throughout — max() is order-free."""
    cum, totals = _binned_cdf_frames(spark, sf_dir)
    # ppm scaling through DOUBLE floor, mirrored in the twin: integer
    # cc * 1000000 would wrap Spark's long past ~9.2e12 cumulative rows
    # (DuckDB's HUGEINT would not — a silent at-scale divergence);
    # both engines take long->double->*1e6->/->floor with identical
    # rounding at every step.
    # One-sided guard (review r7): with rows of only one type the other
    # total is 0 and the ppm division throws under ANSI while DuckDB
    # returns a row — a KS statistic needs BOTH samples, so one-sided
    # input yields zero rows on both engines (WHERE mirrored in twin).
    gap = (
        cum.crossJoin(F.broadcast(totals))
        .filter((F.col("tc") > 0) & (F.col("tp") > 0))
        .select(
            F.abs(
                F.floor(F.col("cc") * F.lit(1000000.0) / F.col("tc")).cast("long")
                - F.floor(F.col("cp") * F.lit(1000000.0) / F.col("tp")).cast("long")
            ).alias("g"),
            "tc",
            "tp",
        )
    )
    return gap.groupBy("tc", "tp").agg(F.max("g").alias("ks_ppm")).select(
        F.col("ks_ppm"),
        F.col("tc").alias("n_click"),
        F.col("tp").alias("n_purchase"),
    )


# The shared binned-CDF CTE body (two/per_bin/cum/tot) — one
# definition for the KS and Cramer-von Mises twins.
_SQL_BINNED_CDF_CTES = """two AS (
  SELECT CAST(floor(value * 10) AS BIGINT) AS bin, event_type AS t
  FROM events WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
),
per_bin AS (
  SELECT bin,
         sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END) AS nc,
         sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END) AS np
  FROM two GROUP BY bin
),
cum AS (
  SELECT bin, nc, np,
         sum(nc) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
         sum(np) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
  FROM per_bin
),
tot AS (SELECT sum(nc) AS tc, sum(np) AS tp FROM per_bin)"""


SQL_AGG_KS_DRIFT = f"""
WITH {_SQL_BINNED_CDF_CTES}
SELECT CAST(max(abs(CAST(floor(CAST(cc AS DOUBLE) * 1000000.0 / tc) AS BIGINT)
             - CAST(floor(CAST(cp AS DOUBLE) * 1000000.0 / tp) AS BIGINT)))
            AS BIGINT) AS ks_ppm,
       CAST(tc AS BIGINT) AS n_click,
       CAST(tp AS BIGINT) AS n_purchase
FROM cum, tot
WHERE tc > 0 AND tp > 0
GROUP BY tc, tp
"""


def q_stats_cvm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Cramer-von Mises drift statistic between the
    click and purchase value distributions — KS's integral companion:
    KS sees only the WORST CDF gap, CvM weights the squared gap over
    the whole distribution, catching broad small drifts a single-point
    statistic misses.  T = tc*tp/N^2 * sum_i w_i * dF_i^2 with w_i the
    observations per bin and dF in ppm integers (the KS chain), so the
    per-bin terms are exact integers and the cross-bin sum rides
    decimal(38,0) — order-free.  Same bounded bin-axis window and
    1-row totals broadcast as agg_ks_drift (allowlisted); one-sided
    input yields zero rows on both engines."""
    cum, totals = _binned_cdf_frames(spark, sf_dir)
    terms = (
        cum.crossJoin(F.broadcast(totals))
        .filter((F.col("tc") > 0) & (F.col("tp") > 0))
        .select(
            "tc",
            "tp",
            (
                (
                    F.floor(F.col("cc") * F.lit(1000000.0) / F.col("tc"))
                    - F.floor(F.col("cp") * F.lit(1000000.0) / F.col("tp"))
                ).cast("decimal(19,0)")
                * (
                    F.floor(F.col("cc") * F.lit(1000000.0) / F.col("tc"))
                    - F.floor(F.col("cp") * F.lit(1000000.0) / F.col("tp"))
                ).cast("decimal(19,0)")
                * (F.col("nc") + F.col("np"))
            ).alias("wg2"),
        )
    )
    fold = terms.groupBy("tc", "tp").agg(
        F.sum("wg2").alias("s_wg2")
    )
    tcd = F.col("tc").cast("double")
    tpd = F.col("tp").cast("double")
    nd = tcd + tpd
    t_stat = tcd * tpd / (nd * nd) * (F.col("s_wg2").cast("double") / 1e12)
    return fold.select(
        F.floor(t_stat * 1000.0 + 0.5).cast("long").alias("cvm_t_milli"),
        F.col("tc").alias("n_click"),
        F.col("tp").alias("n_purchase"),
    )


SQL_STATS_CVM_DRIFT = f"""
WITH {_SQL_BINNED_CDF_CTES},
terms AS (
  SELECT tc, tp,
         CAST(CAST(floor(CAST(cc AS DOUBLE) * 1000000.0 / tc) AS BIGINT)
              - CAST(floor(CAST(cp AS DOUBLE) * 1000000.0 / tp) AS BIGINT)
              AS HUGEINT)
         * (CAST(floor(CAST(cc AS DOUBLE) * 1000000.0 / tc) AS BIGINT)
            - CAST(floor(CAST(cp AS DOUBLE) * 1000000.0 / tp) AS BIGINT))
         * (nc + np) AS wg2
  FROM cum, tot
  WHERE tc > 0 AND tp > 0
)
SELECT CAST(floor(CAST(tc AS DOUBLE) * CAST(tp AS DOUBLE)
                  / ((CAST(tc AS DOUBLE) + CAST(tp AS DOUBLE))
                     * (CAST(tc AS DOUBLE) + CAST(tp AS DOUBLE)))
                  * (CAST(sum(wg2) AS DOUBLE) / 1e12)
                  * 1000.0 + 0.5) AS BIGINT) AS cvm_t_milli,
       CAST(tc AS BIGINT) AS n_click,
       CAST(tp AS BIGINT) AS n_purchase
FROM terms
GROUP BY tc, tp
"""


# --------------------------------------------------------------------
# chi-square independence (event_type x day-of-week)
# --------------------------------------------------------------------


def q_agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square statistic for independence of event_type and
    day-of-week: contingency counts, marginals by join, per-cell
    contribution ((o-e)^2/e) integer-ized to ppm BEFORE the final sum
    — the sum is over integers, so cell order can never drift it.

    Scale: contingency table is |types| x 7 cells regardless of input
    size; all three aggregates are map-side combinable; the 1-row
    grand total broadcasts (pinned cartesian)."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.select(
        "event_type", F.dayofweek("ts").alias("dow")
    ).groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("o"))
    row_tot = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    col_tot = cells.groupBy("dow").agg(F.sum("o").alias("c"))
    grand = cells.agg(F.sum("o").alias("n"))
    contrib = (
        cells.join(row_tot, "event_type")
        .join(col_tot, "dow")
        .crossJoin(F.broadcast(grand))
        .select(
            # expected count computed double-first (cast r before the
            # multiply, mirrored in the twin): integer r*c wraps
            # Spark's long once both marginals pass ~3e9 rows, while
            # DuckDB's HUGEINT marginals stay exact — double-first
            # gives both engines the identical rounding path at any
            # scale
            F.floor(
                (
                    F.pow(
                        F.col("o")
                        - F.col("r").cast("double") * F.col("c") / F.col("n"),
                        F.lit(2.0),
                    )
                    / (F.col("r").cast("double") * F.col("c") / F.col("n"))
                )
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("contrib_ppm"),
            "n",
        )
    )
    return contrib.groupBy("n").agg(
        F.sum("contrib_ppm").alias("chi2_ppm"),
        F.count(F.lit(1)).alias("n_cells"),
    ).select(
        "chi2_ppm",
        "n_cells",
        F.col("n").cast("long").alias("n_events"),
    )


SQL_AGG_CHI2_INDEPENDENCE = """
WITH cells AS (
  SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS o
  FROM events GROUP BY event_type, dayofweek(ts) + 1
),
rt AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY event_type),
ct AS (SELECT dow, sum(o) AS c FROM cells GROUP BY dow),
g AS (SELECT sum(o) AS n FROM cells),
contrib AS (
  SELECT CAST(floor(power(o - CAST(r AS DOUBLE) * c / n, 2)
                    / (CAST(r AS DOUBLE) * c / n) * 1000000 + 0.5)
              AS BIGINT) AS contrib_ppm,
         n
  FROM cells JOIN rt USING (event_type) JOIN ct USING (dow), g
)
SELECT CAST(sum(contrib_ppm) AS BIGINT) AS chi2_ppm,
       count(*) AS n_cells,
       CAST(max(n) AS BIGINT) AS n_events
FROM contrib
"""


# --------------------------------------------------------------------
# Welch's t statistic
# --------------------------------------------------------------------


def q_agg_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t statistic (click vs purchase values) from
    whole-group moments: means and unbiased variances per type via
    integer-cent sums (exact, order-free), then the closed-form t in
    ONE float expression per engine — identical operation order, so
    the ppm integer-ization is stable.

    Scale: a single two-group hash aggregate; the statistic is
    computed on a 1-row frame."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    m = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select(F.col("event_type").alias("t"), cents.alias("x"))
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sums stay EXACT where a long sum of squared cents
            # would wrap past ~4e9 rows/group (DuckDB's HUGEINT side
            # never wraps — the silent at-scale divergence class);
            # the t formula below casts to double at one site on both
            # engines, so the rounding paths stay identical
            F.sum(F.col("x").cast("decimal(28,0)")).alias("s1"),
            F.sum(
                (F.col("x").cast("decimal(19,0)") * F.col("x")).cast(
                    "decimal(38,0)"
                )
            ).alias("s2"),
        )
    )
    # pivot the two rows into one
    one = m.groupBy().agg(
        F.max(F.when(F.col("t") == "click", F.col("n"))).alias("na"),
        F.max(F.when(F.col("t") == "click", F.col("s1"))).alias("sa1"),
        F.max(F.when(F.col("t") == "click", F.col("s2"))).alias("sa2"),
        F.max(F.when(F.col("t") == "purchase", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("t") == "purchase", F.col("s1"))).alias("sb1"),
        F.max(F.when(F.col("t") == "purchase", F.col("s2"))).alias("sb2"),
    )
    sa1 = F.col("sa1").cast("double")
    sa2 = F.col("sa2").cast("double")
    sb1 = F.col("sb1").cast("double")
    sb2 = F.col("sb2").cast("double")
    ma = sa1 / F.col("na")
    mb = sb1 / F.col("nb")
    # Zero-denominator guards (ADVICE r6): a one-row group makes
    # (n-1) = 0 and identical values make the pooled variance exactly
    # 0 — under ANSI mode Spark throws where DuckDB yields NULL/inf,
    # so both degenerate cases yield a NULL t_ppm on BOTH engines
    # (mirrored CASE/NULLIF in the twin; events_autocorr idiom).
    va = F.when(
        F.col("na") > 1, (sa2 - sa1 * sa1 / F.col("na")) / (F.col("na") - 1)
    )
    vb = F.when(
        F.col("nb") > 1, (sb2 - sb1 * sb1 / F.col("nb")) / (F.col("nb") - 1)
    )
    se2 = va / F.col("na") + vb / F.col("nb")
    t_stat = F.when(se2 > 0, (ma - mb) / F.sqrt(se2))
    return one.select(
        F.floor(t_stat * 1000000 + 0.5).cast("long").alias("t_ppm"),
        F.col("na").alias("n_click"),
        F.col("nb").alias("n_purchase"),
    )


SQL_AGG_TTEST_WELCH = """
WITH m AS (
  SELECT event_type AS t, count(*) AS n,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s1,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
             * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s2
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type
),
one AS (
  SELECT max(CASE WHEN t = 'click' THEN n END) AS na,
         max(CASE WHEN t = 'click' THEN s1 END) AS sa1,
         max(CASE WHEN t = 'click' THEN s2 END) AS sa2,
         max(CASE WHEN t = 'purchase' THEN n END) AS nb,
         max(CASE WHEN t = 'purchase' THEN s1 END) AS sb1,
         max(CASE WHEN t = 'purchase' THEN s2 END) AS sb2
  FROM m
),
stat AS (
  SELECT na, nb,
         CAST(sa1 AS DOUBLE) / na - CAST(sb1 AS DOUBLE) / nb AS md,
         CASE WHEN na > 1 THEN (CAST(sa2 AS DOUBLE) - CAST(sa1 AS DOUBLE) * CAST(sa1 AS DOUBLE) / na) / (na - 1) END / na
       + CASE WHEN nb > 1 THEN (CAST(sb2 AS DOUBLE) - CAST(sb1 AS DOUBLE) * CAST(sb1 AS DOUBLE) / nb) / (nb - 1) END / nb AS se2
  FROM one
)
SELECT CAST(floor(
         CASE WHEN se2 > 0 THEN md / sqrt(se2) * 1000000 + 0.5 END
       ) AS BIGINT) AS t_ppm,
       CAST(na AS BIGINT) AS n_click,
       CAST(nb AS BIGINT) AS n_purchase
FROM stat
"""


# --------------------------------------------------------------------
# per-source Jensen-Shannon divergence from the corpus
# --------------------------------------------------------------------


def q_text_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSD(source unigram distribution || corpus distribution) per
    source, in ppb — the vocabulary-drift metric a corpus monitor
    alarms on.

    The absent-word mass is folded in closed form: for words missing
    from a source, p=0 and the word's whole JS contribution is q/2
    (since 0.5*q*log2(2q/q) = q/2), so
        JSD = 0.5*sum_{w in s} p*log2(2p/(p+q))
            + 0.5*sum_{w in s} q*log2(2q/(p+q))
            + 0.5*(1 - Q_s),
    with Q_s the corpus mass of the source's vocabulary — only the
    (source, word) frame is ever materialized, never source x vocab.

    Scale: two hash aggregates over (source, word) and (word), one
    broadcast of the 1-row corpus total; per-word float terms are
    integer-ized to ppb before summation (order-free)."""
    from ..operators.text import words

    d = _t(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(words(F.col("text"))).alias("w"))
    sw = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("csw"))
    s_tot = sw.groupBy("source").agg(F.sum("csw").alias("ts"))
    cw = sw.groupBy("w").agg(F.sum("csw").alias("cw"))
    corpus_tot = cw.agg(F.sum("cw").alias("t"))
    j = (
        sw.join(s_tot, "source")
        .join(cw, "w")
        .crossJoin(F.broadcast(corpus_tot))
    )
    p = F.col("csw") / F.col("ts")
    q = F.col("cw") / F.col("t")
    term = 0.5 * p * F.log2(2 * p / (p + q)) + 0.5 * q * F.log2(
        2 * q / (p + q)
    )
    per_word = j.select(
        "source",
        F.floor(term * 1e9 + 0.5).cast("long").alias("term_ppb"),
        F.floor(q * 1e9 + 0.5).cast("long").alias("q_ppb"),
    )
    return (
        per_word.groupBy("source")
        .agg(
            F.sum("term_ppb").alias("present_ppb"),
            F.sum("q_ppb").alias("qmass_ppb"),
        )
        .select(
            "source",
            (
                F.col("present_ppb")
                + F.expr("(1000000000 - qmass_ppb) div 2")
            ).alias("jsd_ppb"),
        )
    )


SQL_TEXT_JSD_SOURCES = """
WITH tok AS (
  SELECT source, unnest(list_filter(
           regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')) AS w
  FROM documents
),
sw AS (SELECT source, w, count(*) AS csw FROM tok GROUP BY source, w),
st AS (SELECT source, sum(csw) AS ts FROM sw GROUP BY source),
cw AS (SELECT w, sum(csw) AS cw FROM sw GROUP BY w),
ct AS (SELECT sum(cw) AS t FROM cw),
per_word AS (
  SELECT sw.source,
         CAST(floor((0.5 * (csw / ts) * log2(2 * (csw / ts) / (csw / ts + cw / t))
                   + 0.5 * (cw / t) * log2(2 * (cw / t) / (csw / ts + cw / t)))
                    * 1e9 + 0.5) AS BIGINT) AS term_ppb,
         CAST(floor((cw / t) * 1e9 + 0.5) AS BIGINT) AS q_ppb
  FROM sw JOIN st USING (source) JOIN cw USING (w), ct
)
SELECT source,
       CAST(sum(term_ppb) + (1000000000 - sum(q_ppb)) // 2
            AS BIGINT) AS jsd_ppb
FROM per_word GROUP BY source
"""


# --------------------------------------------------------------------
# CUSUM changepoint scan
# --------------------------------------------------------------------


def q_events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint localization on daily event counts per type:
    cumulative sum of (daily count - per-type mean) peaks at the day
    the rate shifted.  Output per type: the peak |CUSUM| (ppm) and the
    day it occurs (earliest day on ties — deterministic argmax via
    min-of-struct).

    Scale: daily rollup (one shuffle), per-type mean as integer ppm
    (total*10^6 DIV n_days — both engines truncate), ONE window
    partitioned by type over its days, then a per-type argmin/argmax
    aggregate.  Days-per-type bounds every frame."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    means = daily.groupBy("event_type").agg(
        F.expr("sum(n) * 1000000 div count(1)").alias("mean_ppm")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = (
        daily.join(means, "event_type")
        .withColumn(
            "cusum_ppm",
            F.sum(F.col("n") * 1000000 - F.col("mean_ppm")).over(w),
        )
    )
    # two-step deterministic argmax: peak value per type, then the
    # earliest day attaining it
    peaks = cusum.groupBy("event_type").agg(
        F.max(F.abs(F.col("cusum_ppm"))).alias("peak_ppm")
    )
    return (
        cusum.join(peaks, "event_type")
        .filter(F.abs(F.col("cusum_ppm")) == F.col("peak_ppm"))
        .groupBy("event_type", "peak_ppm")
        .agg(F.min("day").alias("peak_day"))
        .select("event_type", "peak_ppm", "peak_day")
    )


SQL_EVENTS_CHANGEPOINT_CUSUM = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
),
means AS (
  SELECT event_type, sum(n) * 1000000 // count(*) AS mean_ppm
  FROM daily GROUP BY event_type
),
cusum AS (
  SELECT d.event_type, d.day,
         sum(d.n * 1000000 - m.mean_ppm) OVER (
           PARTITION BY d.event_type ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum_ppm
  FROM daily d JOIN means m USING (event_type)
),
peaks AS (
  SELECT event_type, max(abs(cusum_ppm)) AS peak_ppm
  FROM cusum GROUP BY event_type
)
SELECT c.event_type, CAST(p.peak_ppm AS BIGINT) AS peak_ppm,
       min(c.day) AS peak_day
FROM cusum c JOIN peaks p
  ON c.event_type = p.event_type AND abs(c.cusum_ppm) = p.peak_ppm
GROUP BY c.event_type, p.peak_ppm
"""


# --------------------------------------------------------------------
# tolerance-bounded as-of join
# --------------------------------------------------------------------


def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound: each purchase paired with
    the same user's latest prior click no older than ONE HOUR
    (merge_asof(tolerance=...) semantics; purchases with no
    in-tolerance click keep a NULL match).

    Scale: identical plan shape to join_asof (equi-shuffle on user +
    per-row latest pick); the tolerance predicate additionally prunes
    the join fan-out BEFORE the window, so a user with years of
    clicks contributes only the in-window ones per purchase."""
    from ..operators.relational import asof_join

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
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    return out.select(
        "event_id",
        "user_id",
        "click_event_id",
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_matched_ts"))
        ).alias("gap_us"),
    )


SQL_JOIN_ASOF_TOLERANCE = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, event_id AS click_event_id, ts AS click_ts
           FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, c.click_event_id,
       epoch_us(p.ts) - epoch_us(c.click_ts) AS gap_us
FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.click_ts <= p.ts
                  AND c.click_ts >= p.ts - INTERVAL 1 HOUR
QUALIFY row_number() OVER (PARTITION BY p.event_id
                           ORDER BY c.click_ts DESC NULLS LAST,
                                    c.click_event_id DESC NULLS LAST) = 1
"""


# --------------------------------------------------------------------
# lag-k autocorrelation of daily rates
# --------------------------------------------------------------------


def q_events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (k = 1, 2, 3) of the daily event count
    series per type — the periodicity detector a rate monitor runs
    before fitting a seasonal baseline.

    Pearson r per (type, k) from exact moment sums: the (x_t, x_{t+k})
    pairs come from k lag windows partitioned by type (days-per-type
    bounds every frame), STACKed into (k, x, y) rows; sums are exact
    decimals (daily counts at 1e13-row scale square past a long), and
    the closed-form r is one double expression per engine, emitted as
    integer ppm.
    """
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        F.col("n").alias("x"),
        F.lag("n", 1).over(w).alias("y1"),
        F.lag("n", 2).over(w).alias("y2"),
        F.lag("n", 3).over(w).alias("y3"),
    )
    pairs = lagged.select(
        "event_type",
        F.expr(
            "stack(3, 1, x, y1, 2, x, y2, 3, x, y3) AS (lag_k, x, y)"
        ),
    ).filter(F.col("y").isNotNull())
    dec = lambda c: F.col(c).cast("decimal(28,0)")
    m = pairs.groupBy("event_type", "lag_k").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum((dec("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((dec("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((dec("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    md = F.col("m").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    # zero-variance groups (constant daily counts, or a single pair)
    # make the denominator exactly 0: guard to NULL explicitly — under
    # Spark's default ANSI mode the bare division would THROW while
    # DuckDB returns NULL (mirrored with NULLIF in the twin)
    denom = F.sqrt((md * sxx - sx * sx) * (md * syy - sy * sy))
    r = F.when(denom > 0, (md * sxy - sx * sy) / denom)
    return m.select(
        "event_type",
        F.col("lag_k").cast("long").alias("lag_k"),
        F.floor(r * 1000000 + 0.5).cast("long").alias("r_ppm"),
        F.col("m").alias("n_pairs"),
    )


SQL_EVENTS_AUTOCORR = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
),
lagged AS (
  SELECT event_type, n AS x,
         lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
         lag(n, 2) OVER (PARTITION BY event_type ORDER BY day) AS y2,
         lag(n, 3) OVER (PARTITION BY event_type ORDER BY day) AS y3
  FROM daily
),
pairs AS (
  SELECT event_type, 1 AS lag_k, x, y1 AS y FROM lagged WHERE y1 IS NOT NULL
  UNION ALL
  SELECT event_type, 2, x, y2 FROM lagged WHERE y2 IS NOT NULL
  UNION ALL
  SELECT event_type, 3, x, y3 FROM lagged WHERE y3 IS NOT NULL
),
m AS (
  SELECT event_type, lag_k, count(*) AS m,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs GROUP BY event_type, lag_k
)
SELECT event_type, CAST(lag_k AS BIGINT) AS lag_k,
       CAST(floor(
         (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / NULLIF(sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0)
         * 1000000 + 0.5) AS BIGINT) AS r_ppm,
       m AS n_pairs
FROM m
"""



QUERIES: dict[str, QuerySpec] = {
    "agg_ks_drift": QuerySpec(q_agg_ks_drift, SQL_AGG_KS_DRIFT),
    "stats_cvm_drift": QuerySpec(q_stats_cvm_drift, SQL_STATS_CVM_DRIFT),
    "agg_chi2_independence": QuerySpec(
        q_agg_chi2_independence, SQL_AGG_CHI2_INDEPENDENCE
    ),
    "agg_ttest_welch": QuerySpec(q_agg_ttest_welch, SQL_AGG_TTEST_WELCH),
    "text_jsd_sources": QuerySpec(q_text_jsd_sources, SQL_TEXT_JSD_SOURCES),
    "events_changepoint_cusum": QuerySpec(
        q_events_changepoint_cusum, SQL_EVENTS_CHANGEPOINT_CUSUM
    ),
    "join_asof_tolerance": QuerySpec(
        q_join_asof_tolerance, SQL_JOIN_ASOF_TOLERANCE
    ),
    "events_autocorr": QuerySpec(q_events_autocorr, SQL_EVENTS_AUTOCORR),
}
