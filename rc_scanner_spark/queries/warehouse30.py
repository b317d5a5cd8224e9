"""Round-11 batch 46: warehouse/analytics operators.

* ``orders_basket_lift`` — market-basket co-purchase pairs over
  lineitem baskets with support / confidence / lift (the classic
  association-rule readout).
* ``events_markov_transitions`` — per-user event-type transition
  matrix (first-order Markov counts + row-conditional probabilities).
* ``events_streaks`` — histogram of longest consecutive-active-day
  streaks per user (gaps-and-islands).
* ``supplier_return_rate`` — per-supplier return rate with a Wilson
  lower confidence bound for rate ranking (small-n suppliers can't
  top the list on luck).
* ``embed_silhouette_simplified`` — centroid-based (simplified)
  silhouette per label: the standard clustering-quality readout at
  O(n·k) instead of O(n²).
* ``stats_bh_fdr`` — Benjamini-Hochberg step-up FDR over the per-type
  Welch z of value drift across the epoch midpoint (m simultaneous
  drift tests with controlled false-discovery rate).

Engine-parity: cross-row folds are integers (cents / 1e-6-grid
coordinates / counts); each final statistic is ONE double chain
written identically on both sides.  ``stats_bh_fdr`` converts |z| to
a two-sided p with the Abramowitz-Stegun 26.2.19 polynomial — pure
+ * / and repeated squaring, NO engine exp/erf (PARITY.md #9: libm
transcendentals are not correctly rounded; IEEE + * / sqrt are), so
p hashes bit-exactly.  The BH comparison p*m <= alpha*i is evaluated
on those bit-identical doubles with literal alpha on both engines.

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; extends SURVEY.md §2.B's aggregation/stats
categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned
from .warehouse25 import SQL_EPOCH_MID_CTE, epoch_mid
from .warehouse28 import _US_PER_DAY, checked_div_sql

_t = load_tuned


# --------------------------------------------------------------------
# market-basket lift
# --------------------------------------------------------------------

_BASKET_MIN_PAIR_N = 2
# Pair-build cap: only the first _BASKET_MAX_PARTS SORTED distinct
# parts of a basket enter the in-row pair explode, bounding the
# per-row struct array at k*(k-1)/2 <= 32,640 entries (~0.5 MB) no
# matter how pathological a basket is — the uncapped build is
# quadratic in basket size and a single million-item basket would
# materialize ~5e11 structs inside ONE row before explode (r11 brief
# #5).  At the registry's data shape (measured max distinct
# parts/order: 7 at sf0.001, 13 at sf0.01, 17 at sf0.1 — pinned by
# tests/test_round12.py) the cap NEVER binds, so results are
# unchanged; the DuckDB twin applies the identical sorted-prefix cap
# so both engines agree on pathological inputs too.
_BASKET_MAX_PARTS = 256


def q_orders_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase association pairs: for parts (a, b) appearing in
    >= 2 common orders, the pair support, directional confidence
    P(b|a) and symmetric lift n_ab*N/(n_a*n_b), both in ppm via exact
    integer division.

    Scale shape: baskets are bounded (TPC-H <= 7 lines per order; the
    _BASKET_MAX_PARTS sorted-prefix cap bounds adversarial baskets),
    so pairs explode MAP-SIDE from a per-order collect_set (<= k^2/2
    per basket — the ngram-bucket recipe, operators/dedup.py), never a
    big self-join; the two count dimensions join back on the pair
    keys.  Shuffles are linear in baskets + pairs."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    part_n = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("n_part")
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.slice(
            F.array_sort(F.collect_set("l_partkey")),
            1,
            _BASKET_MAX_PARTS,
        ).alias("parts")
    )
    ids = F.col("parts")
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    ids,
                    lambda x, i: F.transform(
                        F.slice(ids, i + 2, F.size(ids)),
                        lambda y: F.struct(x.alias("pa"), y.alias("pb")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.pa", "p.pb")
    pair_n = (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= _BASKET_MIN_PAIR_N)
    )
    return (
        pair_n.join(
            part_n.select(F.col("pk").alias("pa"), F.col("n_part").alias("n_a")),
            "pa",
        )
        .join(
            part_n.select(F.col("pk").alias("pb"), F.col("n_part").alias("n_b")),
            "pb",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            "n_pair",
            "n_a",
            "n_b",
            F.expr(
                "CAST(n_pair AS decimal(19,0)) * 1000000 DIV n_a"
            ).cast("long").alias("conf_a_to_b_ppm"),
            F.expr(
                checked_div_sql(
                    "CAST(n_pair AS decimal(38,0)) * n_orders * 1000000",
                    "CAST(n_a AS decimal(19,0)) * n_b",
                )
            ).cast("long").alias("lift_ppm"),
        )
        .orderBy("part_a", "part_b")
    )


SQL_ORDERS_BASKET_LIFT = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
part_n AS (SELECT l_partkey AS pk, count(*) AS n_part FROM li GROUP BY 1),
-- identical sorted-prefix cap as the Spark side: only the first
-- {_BASKET_MAX_PARTS} sorted distinct parts per order enter the pair
-- build (never binds at TPC-H's <= 7 parts/order)
capped AS (
  SELECT l_orderkey,
         unnest(list_slice(list_sort(list(l_partkey)), 1,
                           {_BASKET_MAX_PARTS})) AS pk
  FROM li GROUP BY l_orderkey
),
pair_n AS (
  SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_pair
  FROM capped a JOIN capped b
    ON a.l_orderkey = b.l_orderkey AND a.pk < b.pk
  GROUP BY 1, 2
  HAVING count(*) >= {_BASKET_MIN_PAIR_N}
)
SELECT p.pa AS part_a, p.pb AS part_b,
       CAST(p.n_pair AS BIGINT) AS n_pair,
       CAST(na.n_part AS BIGINT) AS n_a,
       CAST(nb.n_part AS BIGINT) AS n_b,
       CAST((CAST(p.n_pair AS HUGEINT) * 1000000) // na.n_part AS BIGINT)
           AS conf_a_to_b_ppm,
       CAST((CAST(p.n_pair AS HUGEINT) * n.n_orders * 1000000)
            // (CAST(na.n_part AS HUGEINT) * nb.n_part) AS BIGINT)
           AS lift_ppm
FROM pair_n p
JOIN part_n na ON na.pk = p.pa
JOIN part_n nb ON nb.pk = p.pb
CROSS JOIN n
ORDER BY part_a, part_b
"""


# --------------------------------------------------------------------
# Markov transition matrix
# --------------------------------------------------------------------


def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: per user,
    events ordered by (ts, event_id) — event_id breaks timestamp ties
    deterministically — pair each event with its successor, count
    (prev, next) transitions, and report the row-conditional
    probability in ppm via exact integer division.

    Scale: one per-user window (bounded partitions — a user's event
    history), one (prev, next) aggregate over <= |types|^2 keys."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("prev_type"),
            F.col("next_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = trans.groupBy("prev_type").agg(F.sum("n").alias("n_row"))
    return (
        trans.join(row_tot, "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.expr("CAST(n AS decimal(19,0)) * 1000000 DIV n_row")
            .cast("long")
            .alias("p_ppm"),
        )
        .orderBy("prev_type", "next_type")
    )


SQL_EVENTS_MARKOV_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS next_type
  FROM events
),
trans AS (
  SELECT event_type AS prev_type, next_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
),
row_tot AS (SELECT prev_type, sum(n) AS n_row FROM trans GROUP BY 1)
SELECT t.prev_type, t.next_type, CAST(t.n AS BIGINT) AS n,
       CAST((CAST(t.n AS HUGEINT) * 1000000) // r.n_row AS BIGINT) AS p_ppm
FROM trans t JOIN row_tot r USING (prev_type)
ORDER BY prev_type, next_type
"""


# --------------------------------------------------------------------
# activity streaks (gaps-and-islands)
# --------------------------------------------------------------------


def q_events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user, reported as a
    histogram (streak_len -> n_users): the gaps-and-islands pattern —
    island id = day_number - row_number over the user's distinct
    active days, so consecutive days share an island.

    Scale: per-user windows over distinct active DAYS (bounded:
    <= days-in-history rows per user), then two small aggregates."""
    ud = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(f"unix_micros(ts) DIV {_US_PER_DAY}").alias("dnum"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("dnum")
    islands = ud.withColumn(
        "island", F.col("dnum") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    longest = streaks.groupBy("user_id").agg(F.max("len").alias("streak_len"))
    return (
        longest.groupBy("streak_len")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("streak_len")
    )


SQL_EVENTS_STREAKS = f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS dnum
  FROM events
),
islands AS (
  SELECT user_id,
         dnum - row_number() OVER (PARTITION BY user_id ORDER BY dnum)
             AS island
  FROM ud
),
streaks AS (
  SELECT user_id, island, count(*) AS len
  FROM islands GROUP BY 1, 2
),
longest AS (SELECT user_id, max(len) AS streak_len FROM streaks GROUP BY 1)
SELECT CAST(streak_len AS BIGINT) AS streak_len,
       count(*) AS n_users
FROM longest
GROUP BY streak_len
ORDER BY streak_len
"""


# --------------------------------------------------------------------
# supplier return rate with Wilson lower bound
# --------------------------------------------------------------------

_WILSON_Z = 1.959964  # two-sided 95% normal quantile, literal (PARITY #9)


def q_supplier_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier return rate (share of lineitems with returnflag
    'R') plus the Wilson score lower bound at 95% — the ranking
    statistic that keeps a 1-for-1 supplier from outranking a
    3-for-1000 one.  Counts are exact integers; the Wilson chain is
    ONE identical double expression per engine (sqrt is correctly
    rounded).  Scale: one per-supplier aggregate + a broadcast
    supplier-dim join."""
    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("n_returned"),
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    n = F.col("n_items").cast("double")
    p = F.col("n_returned").cast("double") / n
    z2 = F.lit(_WILSON_Z) * F.lit(_WILSON_Z)
    denom = 1.0 + z2 / n
    center = p + z2 / (2.0 * n)
    spread = F.lit(_WILSON_Z) * F.sqrt(
        p * (1.0 - p) / n + z2 / (4.0 * (n * n))
    )
    wilson = (center - spread) / denom
    return (
        per.join(F.broadcast(sup), "s_suppkey")
        .select(
            "s_suppkey",
            "s_name",
            "n_items",
            "n_returned",
            F.expr(
                "CAST(n_returned AS decimal(19,0)) * 1000000 DIV n_items"
            ).cast("long").alias("rate_ppm"),
            F.floor(wilson * 1000000.0 + 0.5).cast("long").alias(
                "wilson_lcb_ppm"
            ),
        )
        .orderBy(F.col("wilson_lcb_ppm").desc(), "s_suppkey")
    )


# _Z_SQL mirrors the BH-FDR twin's CAST(alpha AS DOUBLE) pattern:
# without the cast DuckDB parses the bare literal as DECIMAL and
# computes z*z exactly before converting — numerically equal for
# 1.959964, but a future literal change could flip a ppm grid cell
# (ADVICE r11).  With the cast both engines square the same double.
_Z_SQL = f"CAST({_WILSON_Z} AS DOUBLE)"

SQL_SUPPLIER_RETURN_RATE = f"""
WITH per AS (
  SELECT l_suppkey AS s_suppkey, count(*) AS n_items,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned
  FROM lineitem GROUP BY 1
)
SELECT p.s_suppkey, s.s_name,
       CAST(p.n_items AS BIGINT) AS n_items,
       CAST(p.n_returned AS BIGINT) AS n_returned,
       CAST((CAST(p.n_returned AS HUGEINT) * 1000000) // p.n_items AS BIGINT)
           AS rate_ppm,
       CAST(floor(
         ((CAST(p.n_returned AS DOUBLE) / CAST(p.n_items AS DOUBLE)
           + {_Z_SQL} * {_Z_SQL} / (2.0 * CAST(p.n_items AS DOUBLE)))
          - {_Z_SQL} * sqrt(
              (CAST(p.n_returned AS DOUBLE) / CAST(p.n_items AS DOUBLE))
              * (1.0 - CAST(p.n_returned AS DOUBLE) / CAST(p.n_items AS DOUBLE))
              / CAST(p.n_items AS DOUBLE)
              + {_Z_SQL} * {_Z_SQL}
                / (4.0 * (CAST(p.n_items AS DOUBLE) * CAST(p.n_items AS DOUBLE)))))
         / (1.0 + {_Z_SQL} * {_Z_SQL} / CAST(p.n_items AS DOUBLE))
         * 1000000.0 + 0.5) AS BIGINT) AS wilson_lcb_ppm
FROM per p JOIN supplier s USING (s_suppkey)
ORDER BY wilson_lcb_ppm DESC, s_suppkey
"""


# --------------------------------------------------------------------
# simplified silhouette
# --------------------------------------------------------------------


def q_embed_silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per label: for each
    vector, a = distance to its own label centroid, b = min distance
    to any OTHER label centroid, s = (b - a) / max(a, b); report the
    per-label mean in ppm.  O(n * k) — the standard scale substitute
    for the O(n^2) exact silhouette.

    Determinism (the embed_label_separation integer recipe): vector
    coordinates snap to an exact 1e-6 grid; per-label centroid =
    (sum-grid s6, count n) kept as INTEGERS, and each squared
    distance folds as the exact integer
    sum_i (x6_i * n - s6_i)^2 in decimal(38,0) — no float sum ever
    crosses a row/dim boundary.  The only doubles are
    sqrt(dist2)/(n*1e6) per (point, centroid) and the final s chain,
    identical on both engines; s snaps to a 1e-4 grid before the
    integer mean."""
    e = _t(spark, sf_dir, "embeddings")
    x6 = e.select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding"),
            lambda v: F.floor(v.cast("double") * 1e6 + 0.5).cast("long"),
        ).alias("x6"),
    )
    grid = x6.select(
        "label", F.posexplode("x6").alias("pos", "g6")
    )
    cents = (
        grid.groupBy("label", "pos")
        .agg(F.sum("g6").alias("s6"), F.count(F.lit(1)).alias("n"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", F.col("s6").alias("s")))
                ),
                lambda r: r["s"],
            ).alias("s6v"),
            F.max("n").alias("cn"),
        )
    )
    pc = x6.crossJoin(
        F.broadcast(
            cents.select(
                F.col("label").alias("clabel"), "s6v", "cn"
            )
        )
    )
    # exact integer squared distance: sum_i (x6_i*cn - s6_i)^2; the
    # per-dim terms are decimal(38,0) so ~1e28 magnitudes cannot wrap
    dist2 = F.aggregate(
        F.zip_with(
            F.col("x6"),
            F.col("s6v"),
            lambda x, s: (
                (x * F.col("cn") - s).cast("decimal(38,0)")
                * (x * F.col("cn") - s)
            ),
        ),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, t: acc + t,
    )
    dist = F.sqrt(dist2.cast("double")) / (
        F.col("cn").cast("double") * 1e6
    )
    pd = pc.select(
        "vec_id",
        "label",
        "clabel",
        dist.alias("dist"),
    )
    ab = pd.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("dist"))).alias("b"),
    )
    # b is NULL iff the corpus has a single label (no "other"
    # centroid): define s = 0 explicitly on BOTH engines — Spark's
    # greatest() skips NULLs while DuckDB's propagates them, so the
    # unguarded expression silently diverges on that corner.
    s = F.when(F.col("b").isNull(), F.lit(0.0)).when(
        F.greatest(F.col("a"), F.col("b")) > 0.0,
        (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b")),
    ).otherwise(F.lit(0.0))
    s4 = F.floor(s * 10000.0 + 0.5).cast("long")
    return (
        ab.select("label", s4.alias("s4"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            # mirrored double floor (embed_label_separation): a long
            # sum(s4)*100 would wrap past ~9.2e12 members
            F.floor(
                F.sum("s4").cast("double") * 100.0 / F.count(F.lit(1))
            ).cast("long").alias("silhouette_ppm"),
        )
        .orderBy("label")
    )


SQL_EMBED_SILHOUETTE_SIMPLIFIED = """
WITH x AS (
  SELECT vec_id, label,
         [CAST(floor(CAST(v AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
          FOR v IN embedding] AS x6
  FROM embeddings
),
grid AS (
  SELECT label, unnest(x6) AS g6,
         unnest(range(1, len(x6) + 1)) AS pos
  FROM x
),
cd AS (
  SELECT label, pos, sum(g6) AS s6, count(*) AS n
  FROM grid GROUP BY 1, 2
),
cents AS (
  SELECT label AS clabel, list(s6 ORDER BY pos) AS s6v, max(n) AS cn
  FROM cd GROUP BY label
),
pd AS (
  SELECT x.vec_id, x.label, c.clabel,
         sqrt(CAST(list_sum(
           [CAST(CAST(x.x6[i] * c.cn - c.s6v[i] AS HUGEINT)
                 * (x.x6[i] * c.cn - c.s6v[i]) AS HUGEINT)
            FOR i IN range(1, len(x.x6) + 1)]) AS DOUBLE))
         / (CAST(c.cn AS DOUBLE) * 1e6) AS dist
  FROM x CROSS JOIN cents c
),
ab AS (
  SELECT vec_id, label,
         max(CASE WHEN clabel = label THEN dist END) AS a,
         min(CASE WHEN clabel <> label THEN dist END) AS b
  FROM pd GROUP BY 1, 2
),
s AS (
  SELECT label,
         CAST(floor(
           CASE WHEN b IS NULL THEN 0.0
                WHEN greatest(a, b) > 0.0
                THEN (b - a) / greatest(a, b) ELSE 0.0 END
           * 10000.0 + 0.5) AS BIGINT) AS s4
  FROM ab
)
SELECT label, count(*)::BIGINT AS n_members,
       CAST(floor(CAST(sum(s4) AS DOUBLE) * 100.0 / count(*)) AS BIGINT)
           AS silhouette_ppm
FROM s
GROUP BY label
ORDER BY label
"""


# --------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-type drift tests
# --------------------------------------------------------------------

_BH_ALPHA = 0.1
# Abramowitz-Stegun 26.2.19 coefficients for the standard normal CDF:
# P(x) = 1 - 0.5 * (1 + d1 x + ... + d6 x^6)^-16, x >= 0, |eps|<1.5e-7.
_AS_D = (
    0.0498673470,
    0.0211410061,
    0.0032776263,
    0.0000380036,
    0.0000488906,
    0.0000053830,
)


def _p_two_sided(az: F.Column) -> F.Column:
    """Two-sided normal p from |z| via A&S 26.2.19: pure + * / and
    four squarings — every op IEEE-correctly-rounded, so the value is
    bit-identical across engines (no exp/erf)."""
    d1, d2, d3, d4, d5, d6 = _AS_D
    z2 = az * az
    z3 = z2 * az
    z4 = z2 * z2
    z5 = z4 * az
    z6 = z4 * z2
    base = (
        F.lit(1.0)
        + F.lit(d1) * az
        + F.lit(d2) * z2
        + F.lit(d3) * z3
        + F.lit(d4) * z4
        + F.lit(d5) * z5
        + F.lit(d6) * z6
    )
    b2 = base * base
    b4 = b2 * b2
    b8 = b4 * b4
    b16 = b8 * b8
    return F.lit(1.0) / b16


def _sql_p_two_sided(az: str) -> str:
    """The identical chain as DuckDB SQL text over the expression
    ``az``: the base polynomial, then b16 by four explicit squarings
    (each a correctly-rounded IEEE multiply, so the value matches
    Spark's b2/b4/b8/b16 ladder bit-for-bit)."""
    d1, d2, d3, d4, d5, d6 = _AS_D
    z2 = f"({az}*{az})"
    z3 = f"({z2}*{az})"
    z4 = f"({z2}*{z2})"
    z5 = f"({z4}*{az})"
    z6 = f"({z4}*{z2})"
    base = (
        f"(1.0 + {d1} * {az} + {d2} * {z2} + {d3} * {z3}"
        f" + {d4} * {z4} + {d5} * {z5} + {d6} * {z6})"
    )
    b2 = f"({base}*{base})"
    b4 = f"({b2}*{b2})"
    b8 = f"({b4}*{b4})"
    b16 = f"({b8}*{b8})"
    return f"1.0 / {b16}"


def welch_drift_ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multiple-testing input frame shared by ``stats_bh_fdr``
    and ``stats_holm_bonferroni`` (warehouse35): per event type, the
    Welch z of value drift across the epoch midpoint (exact
    integer-cent moments, the agg_ttest_welch fold per (type, half))
    and its two-sided p via the A&S polynomial.  Degenerate types (a
    half with n < 2, or zero pooled variance) yield NULL z and are
    EXCLUDED on both engines.  Twin prefix: ``SQL_WELCH_PS_CTES``."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("x"),
    )
    mid = epoch_mid(ev)
    per = (
        ev.crossJoin(F.broadcast(mid))
        .withColumn("h", F.when(F.col("us") <= F.col("mid_us"), 0).otherwise(1))
        .groupBy("event_type", "h")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast("decimal(28,0)")).alias("s1"),
            F.sum(
                (F.col("x").cast("decimal(19,0)") * F.col("x")).cast(
                    "decimal(38,0)"
                )
            ).alias("s2"),
        )
    )
    one = per.groupBy("event_type").agg(
        F.max(F.when(F.col("h") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("h") == 0, F.col("s1"))).alias("sa1"),
        F.max(F.when(F.col("h") == 0, F.col("s2"))).alias("sa2"),
        F.max(F.when(F.col("h") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("h") == 1, F.col("s1"))).alias("sb1"),
        F.max(F.when(F.col("h") == 1, F.col("s2"))).alias("sb2"),
    )
    sa1 = F.col("sa1").cast("double")
    sa2 = F.col("sa2").cast("double")
    sb1 = F.col("sb1").cast("double")
    sb2 = F.col("sb2").cast("double")
    # staged named columns keep the Catalyst tree linear (the TOST
    # lesson, warehouse31): each level collapses to an attribute
    staged = one.select(
        "event_type",
        "na",
        "nb",
        (sa1 / F.col("na")).alias("ma"),
        (sb1 / F.col("nb")).alias("mb"),
        F.when(
            F.col("na") > 1, (sa2 - sa1 * sa1 / F.col("na")) / (F.col("na") - 1)
        ).alias("va"),
        F.when(
            F.col("nb") > 1, (sb2 - sb1 * sb1 / F.col("nb")) / (F.col("nb") - 1)
        ).alias("vb"),
    ).withColumn(
        "se2", F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    )
    z = F.when(
        F.col("se2") > 0,
        (F.col("ma") - F.col("mb")) / F.sqrt(F.col("se2")),
    )
    # Filter on z BEFORE computing p: p is null iff z is null (the
    # polynomial of a non-null |z| never is — base >= 1), and a
    # p-IS-NOT-NULL filter gets predicate-pushed through the
    # projections, inlining the whole polynomial-over-Welch chain
    # into a ~320 KB filter expression (6 MiB task binary, ~7 s of
    # fixed Janino codegen at ANY scale — the r11 verdict's slowest-
    # 1x-entry finding).  Filtering on the z attribute keeps the
    # pushed predicate to the staged CASE chain and the polynomial is
    # instantiated exactly once, post-filter.
    return (
        staged.select("event_type", z.alias("z"))
        .filter(F.col("z").isNotNull())
        .withColumn("p", _p_two_sided(F.abs(F.col("z"))))
    )


def q_stats_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR (alpha=0.1) over the per-type
    Welch z of value drift across the epoch midpoint: m simultaneous
    pre/post mean-shift tests, each from exact integer-cent moments
    (the agg_ttest_welch fold applied per (type, half)), |z| -> p via
    the A&S polynomial (see module docstring), then reject the
    hypotheses ranked 1..i* where i* = max{i : p_(i) * m <= alpha * i}
    — the comparison runs on bit-identical doubles (the twin CASTs
    alpha to DOUBLE before multiplying: DuckDB's decimal-literal
    product is one ulp off the double product),
    and m / i* are full-frame window aggregates over the <= |types|-row
    valid frame (bounded by construction, pinned in test_plan_audit).
    Degenerate types (a half with n < 2, or zero pooled variance)
    yield NULL z and are EXCLUDED from m on both engines."""
    valid = welch_drift_ps(spark, sf_dir)
    # The whole BH readout is WINDOWS over the <= |types|-row valid
    # frame (bounded by construction, pinned in test_plan_audit): m as
    # a full-frame count, the step-up threshold i* as a full-frame
    # conditional max.  One job, one sort — the earlier shape (m and
    # i* as broadcast 1-row aggregates of a persisted frame) paid a
    # cache build + three broadcast query stages ~8 s per run for the
    # same 5 rows.
    w_rank = Window.orderBy("p", "event_type")
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
    imax = F.max(
        F.when(
            F.col("p") * F.col("m").cast("double")
            <= F.lit(_BH_ALPHA) * F.col("p_rank").cast("double"),
            F.col("p_rank"),
        )
    ).over(w_full)
    return (
        ranked.withColumn("imax", imax)
        .select(
            "event_type",
            F.floor(F.col("z") * 1000.0 + 0.5).cast("long").alias("z_milli"),
            F.floor(F.col("p") * 1000000.0 + 0.5).cast("long").alias("p_ppm"),
            "p_rank",
            "m",
            (F.col("p_rank") <= F.coalesce(F.col("imax"), F.lit(0))).alias(
                "rejected"
            ),
        )
        .orderBy("p_rank")
    )


# CTE prefix through `ps` (event_type, z, p) — the twin of
# welch_drift_ps, shared by SQL_STATS_BH_FDR and warehouse35's
# SQL_STATS_HOLM_BONFERRONI
SQL_WELCH_PS_CTES = f"""ev AS (
  SELECT event_type, epoch_us(ts) AS us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
),
{SQL_EPOCH_MID_CTE},
per AS (
  SELECT event_type,
         CASE WHEN e.us <= m.mid_us THEN 0 ELSE 1 END AS h,
         count(*) AS n, sum(x) AS s1,
         sum(CAST(x AS HUGEINT) * x) AS s2
  FROM ev e CROSS JOIN mid m
  GROUP BY 1, 2
),
one AS (
  SELECT event_type,
         max(CASE WHEN h = 0 THEN n END) AS na,
         max(CASE WHEN h = 0 THEN s1 END) AS sa1,
         max(CASE WHEN h = 0 THEN s2 END) AS sa2,
         max(CASE WHEN h = 1 THEN n END) AS nb,
         max(CASE WHEN h = 1 THEN s1 END) AS sb1,
         max(CASE WHEN h = 1 THEN s2 END) AS sb2
  FROM per GROUP BY 1
),
zs AS (
  SELECT event_type,
         CASE WHEN (CASE WHEN na > 1 THEN
                      (CAST(sa2 AS DOUBLE)
                       - CAST(sa1 AS DOUBLE) * CAST(sa1 AS DOUBLE) / na)
                      / (na - 1) END) / na
                   + (CASE WHEN nb > 1 THEN
                      (CAST(sb2 AS DOUBLE)
                       - CAST(sb1 AS DOUBLE) * CAST(sb1 AS DOUBLE) / nb)
                      / (nb - 1) END) / nb > 0
              THEN (CAST(sa1 AS DOUBLE) / na - CAST(sb1 AS DOUBLE) / nb)
                   / sqrt((CASE WHEN na > 1 THEN
                            (CAST(sa2 AS DOUBLE)
                             - CAST(sa1 AS DOUBLE) * CAST(sa1 AS DOUBLE) / na)
                            / (na - 1) END) / na
                          + (CASE WHEN nb > 1 THEN
                            (CAST(sb2 AS DOUBLE)
                             - CAST(sb1 AS DOUBLE) * CAST(sb1 AS DOUBLE) / nb)
                            / (nb - 1) END) / nb)
         END AS z
  FROM one
),
ps AS (
  SELECT event_type, z, {_sql_p_two_sided('abs(z)')} AS p
  FROM zs WHERE z IS NOT NULL
)"""


SQL_STATS_BH_FDR = f"""
WITH {SQL_WELCH_PS_CTES},
mm AS (SELECT count(*) AS m FROM ps),
ranked AS (
  SELECT p.event_type, p.z, p.p, mm.m,
         row_number() OVER (ORDER BY p.p, p.event_type) AS p_rank
  FROM ps p CROSS JOIN mm
),
thr AS (
  -- CAST: DuckDB parses the bare literal as DECIMAL and 0.1 * 3 in
  -- decimal is EXACTLY 0.3 -> double 0.2999999999999999889, one ulp
  -- BELOW Spark's double(0.1)*3 = 0.3000000000000000444 (review r11,
  -- verified by execution) -- a p*m in that window flips the verdict
  SELECT max(p_rank) AS imax FROM ranked
  WHERE p * m <= CAST({_BH_ALPHA} AS DOUBLE) * p_rank
)
SELECT r.event_type,
       CAST(floor(r.z * 1000.0 + 0.5) AS BIGINT) AS z_milli,
       CAST(floor(r.p * 1000000.0 + 0.5) AS BIGINT) AS p_ppm,
       CAST(r.p_rank AS BIGINT) AS p_rank,
       CAST(r.m AS BIGINT) AS m,
       r.p_rank <= coalesce(t.imax, 0) AS rejected
FROM ranked r CROSS JOIN thr t
ORDER BY p_rank
"""


QUERIES: dict[str, QuerySpec] = {
    "orders_basket_lift": QuerySpec(
        q_orders_basket_lift, SQL_ORDERS_BASKET_LIFT
    ),
    "events_markov_transitions": QuerySpec(
        q_events_markov_transitions, SQL_EVENTS_MARKOV_TRANSITIONS
    ),
    "events_streaks": QuerySpec(q_events_streaks, SQL_EVENTS_STREAKS),
    "supplier_return_rate": QuerySpec(
        q_supplier_return_rate, SQL_SUPPLIER_RETURN_RATE
    ),
    "embed_silhouette_simplified": QuerySpec(
        q_embed_silhouette_simplified, SQL_EMBED_SILHOUETTE_SIMPLIFIED
    ),
    "stats_bh_fdr": QuerySpec(q_stats_bh_fdr, SQL_STATS_BH_FDR),
}
