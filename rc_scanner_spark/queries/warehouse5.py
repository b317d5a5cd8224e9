"""Round-6 batch 13: association rules, inequality (Gini) profiling,
a distributed Mann-Whitney rank test, segmented lexical diversity, and
a WebDataset-style shard manifest.

Why these belong in a 100 TB training-data engine:

* ``basket_association_rules`` — directed A->B rules with confidence
  and lift extend the undirected pair-support mining
  (``basket_part_pairs``): the standard output a recommender / query-
  rewrite pipeline consumes.  Pair generation stays bounded by the
  per-basket item cap; the marginals are one broadcast-able aggregate.
* ``agg_gini`` — the Gini coefficient is the stock inequality summary
  for per-group contribution skew (tokens contributed per source,
  spend per customer segment).  The rank-weighted form needs one
  partitioned sort per group — never a global sort.
* ``stats_mann_whitney`` — the nonparametric two-sample location test
  (Wilcoxon rank-sum) for "did metric X shift between variants",
  robust where Welch's t (``agg_ttest_welch``) assumes normality.
  Global ranks are computed WITHOUT a global sort via the same
  two-phase bucket-offset scheme as ``seq_global_row_number``:
  per-value tie groups aggregate distributedly, a <=512-row bucket
  frame carries the cumulative offsets.
* ``text_ttr_segments`` — segmented type-token ratio (the windowed
  TTR underlying MTLD) is the standard lexical-diversity signal that
  raw TTR can't give on variable-length docs; a pure tokenize-explode
  plus two doc-keyed aggregates.
* ``multimodal_shard_manifest`` — greedy byte-budget shard assignment
  (the WebDataset / tar-shard layout step for any multimodal corpus).
  The cumulative sum is partitioned per source, so no global window
  exists at any corpus size; shards are per-source sequential, which
  is exactly how sharded tar exports are laid out in practice.

Engine-parity notes: shares and scores go through integer ppm /
milli with a double-first floor (bigint products past ~9.2e18 at the
1e13-row design point would throw under ANSI); exact integer
aggregates ride decimal(38,0) on the Spark side and HUGEINT on the
DuckDB side; every final double expression is the same left-to-right
chain on both engines; zero-denominator guards are ``when()`` on the
Spark side mirrored as ``NULLIF`` in the twin (Spark ANSI throws on
double/0 where DuckDB yields NULL).

Reference scope note: the reference engine (scanner.py:120-175)
has no analytics surface; these extend SURVEY.md §2.B's warehouse /
text / multimodal categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned

_t = load_tuned


# --------------------------------------------------------------------
# directed association rules (confidence + lift)
# --------------------------------------------------------------------

_RULE_MAX_ORDER = 20   # per-basket distinct-item cap (bounds the self-join)
_RULE_MIN_SUPPORT = 3
_RULE_MIN_CONF_PPM = 40_000  # >= 4% confidence


def q_basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules pa -> pb over order baskets with
    support, confidence (ppm) and lift (ppm).

    Scale: pair candidates come from the order-keyed self-join over
    baskets with <= 20 distinct parts (quadratic only in the capped
    basket size, linear in order count); marginals are one part-keyed
    aggregate; the single-row basket total is a broadcast scalar.
    Confidence/lift are double-first floors — ``support * 1e6`` as a
    bigint product would overflow past ~9.2e12 support at design
    scale and throw under ANSI.

    Marginals and the basket total are counted over the SAME capped
    universe (li2) the pair support is mined from — mixing universes
    deflates confidence for parts that mostly occur in over-cap
    baskets (review-round fix, r6)."""
    from .warehouse import capped_baskets

    _li, li2 = capped_baskets(spark, sf_dir, _RULE_MAX_ORDER)
    a = li2.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li2.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") != F.col("pb"))  # directed: both orders kept
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _RULE_MIN_SUPPORT)
    )
    marg = li2.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = li2.agg(F.countDistinct("l_orderkey").alias("tot"))
    conf = F.floor(
        F.col("support").cast("double") * 1000000.0
        / F.col("na").cast("double")
    ).cast("bigint")
    lift = F.floor(
        F.col("support").cast("double") * 1000000.0
        * F.col("tot").cast("double")
        / (F.col("na").cast("double") * F.col("nb").cast("double"))
    ).cast("bigint")
    return (
        pairs.join(
            F.broadcast(
                marg.withColumnRenamed("l_partkey", "pa")
                .withColumnRenamed("n_orders", "na")
            ),
            "pa",
        )
        .join(
            F.broadcast(
                marg.withColumnRenamed("l_partkey", "pb")
                .withColumnRenamed("n_orders", "nb")
            ),
            "pb",
        )
        .crossJoin(F.broadcast(tot))
        .withColumn("confidence_ppm", conf)
        .filter(F.col("confidence_ppm") >= _RULE_MIN_CONF_PPM)
        .select(
            "pa",
            "pb",
            "support",
            "confidence_ppm",
            lift.alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "pa", "pb")
        .limit(50)
    )


def _rules_sql() -> str:
    from .warehouse import basket_cte_sql

    return f"""
WITH {basket_cte_sql(_RULE_MAX_ORDER)},
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS support
  FROM li2 a JOIN li2 b USING (l_orderkey)
  WHERE a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {_RULE_MIN_SUPPORT}
),
marg AS (SELECT l_partkey, count(*) AS n_orders FROM li2 GROUP BY 1),
tot AS (SELECT count(DISTINCT l_orderkey) AS tot FROM li2),
scored AS (
  SELECT p.pa, p.pb, p.support,
         CAST(floor(CAST(p.support AS DOUBLE) * 1000000.0
                    / CAST(ma.n_orders AS DOUBLE)) AS BIGINT)
           AS confidence_ppm,
         CAST(floor(CAST(p.support AS DOUBLE) * 1000000.0
                    * CAST(t.tot AS DOUBLE)
                    / (CAST(ma.n_orders AS DOUBLE)
                       * CAST(mb.n_orders AS DOUBLE))) AS BIGINT)
           AS lift_ppm
  FROM pairs p
  JOIN marg ma ON ma.l_partkey = p.pa
  JOIN marg mb ON mb.l_partkey = p.pb
  CROSS JOIN tot t
)
SELECT pa, pb, support, confidence_ppm, lift_ppm
FROM scored
WHERE confidence_ppm >= {_RULE_MIN_CONF_PPM}
ORDER BY lift_ppm DESC, pa, pb
LIMIT 50
"""


SQL_BASKET_ASSOCIATION_RULES = _rules_sql()


# --------------------------------------------------------------------
# Gini coefficient per group
# --------------------------------------------------------------------


def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer account balance per market
    segment: G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with x
    sorted ascending and i the 1-based rank.

    Scale: the only sort is the rank window PARTITIONED by segment —
    no global ordering; the two weighted sums are exact decimal(38,0)
    aggregates (rank*cents products pass 2^63 long before design
    scale), converted to double only in the final single-chain ppm
    floor.  Rank ties break on c_custkey so both engines enumerate
    the identical permutation."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint").alias("xc"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("xc", "c_custkey")
    ranked = cust.withColumn("rn", F.row_number().over(w))
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("xc").cast("decimal(38,0)")).alias("s0"),
        F.sum(
            (F.col("rn").cast("decimal(38,0)") * F.col("xc")).cast(
                "decimal(38,0)"
            )
        ).alias("s1"),
    )
    num = (
        F.lit(2).cast("decimal(38,0)") * F.col("s1")
        - (F.col("n_customers") + 1).cast("decimal(38,0)") * F.col("s0")
    )
    den = F.col("n_customers").cast("double") * F.col("s0").cast("double")
    gini = F.when(
        F.col("s0") != 0,
        F.floor(num.cast("double") * 1000000.0 / den).cast("bigint"),
    )
    return (
        agg.select(
            "c_mktsegment",
            "n_customers",
            F.col("s0").cast("bigint").alias("sum_cents"),
            gini.alias("gini_ppm"),
        )
        .orderBy("c_mktsegment")
    )


SQL_AGG_GINI = """
WITH ranked AS (
  SELECT c_mktsegment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS xc,
         row_number() OVER (
           PARTITION BY c_mktsegment
           ORDER BY CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT), c_custkey
         ) AS rn
  FROM customer
),
agg AS (
  SELECT c_mktsegment,
         CAST(count(*) AS BIGINT) AS n_customers,
         sum(xc) AS s0,
         sum(CAST(rn AS HUGEINT) * xc) AS s1
  FROM ranked GROUP BY 1
)
SELECT c_mktsegment, n_customers,
       CAST(s0 AS BIGINT) AS sum_cents,
       CASE WHEN s0 <> 0 THEN
         CAST(floor(CAST(2 * s1 - (n_customers + 1) * s0 AS DOUBLE)
                    * 1000000.0
                    / (CAST(n_customers AS DOUBLE) * CAST(s0 AS DOUBLE)))
              AS BIGINT)
       END AS gini_ppm
FROM agg
ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum), two-phase distributed ranks
# --------------------------------------------------------------------

_MW_BUCKETS = 512
_MW_GROUP_A = "click"
_MW_GROUP_B = "view"


def q_stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U comparing ``value`` between the click and view
    event populations, with tie-corrected normal approximation.

    Global average ranks are computed WITHOUT a global sort: tie
    groups aggregate per distinct value (distributed), values land in
    <=512 range buckets from a broadcast min/max scalar, the bucket
    frame's cumulative offsets are a bounded 512-row window, and the
    within-bucket running sum is partitioned by bucket.  Rank units
    are DOUBLED so tied average ranks stay exact integers; weighted
    rank sums ride decimal(38,0).  Only the final z statistic drops
    to doubles — one identical left-to-right chain on both engines,
    with the all-values-tied degenerate case guarded (when/NULLIF).

    Output (1 row): n_a, n_b, u2_a (= 2*U_A), tie_term, z_milli.

    Design-scale bound: the tie correction sums t^3 - t in
    decimal(38,0)/HUGEINT, which overflows (with an explicit ANSI
    throw, never silently) once a SINGLE tied value exceeds ~4.5e12
    rows — a fully-degenerate near-constant metric at the 1e13-row
    design point.  A rank test on such a column is meaningless, so
    the loud failure is the intended behavior."""
    # NULL values are excluded explicitly (same rationale as
    # stats_kruskal_wallis: a NULL tie-group ranks differently
    # between the engines' window NULL orderings and drops out of
    # the per-group join while still counting in n and the ties)
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_MW_GROUP_A, _MW_GROUP_B))
        .filter(F.col("value").isNotNull())
        .select(
            "value",
            F.when(F.col("event_type") == _MW_GROUP_A, 1)
            .otherwise(0)
            .alias("is_a"),
        )
    )
    bounds = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    # tie groups: one row per distinct value (distributed aggregate)
    vb = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("value", "lo", "hi")
        .agg(
            F.sum("is_a").alias("na"),
            F.sum(1 - F.col("is_a")).alias("nb"),
        )
        .withColumn(
            "bucket",
            F.when(
                F.col("hi") > F.col("lo"),
                F.least(
                    F.lit(_MW_BUCKETS - 1),
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / (F.col("hi") - F.col("lo"))
                        * _MW_BUCKETS
                    ).cast("int"),
                ),
            ).otherwise(F.lit(0)),
        )
        .withColumn("t", F.col("na") + F.col("nb"))
    )
    # bounded bucket-offset frame (<=512 rows by construction)
    boff = (
        vb.groupBy("bucket")
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
    per = (
        vb.join(F.broadcast(boff), "bucket")
        .withColumn("run", F.sum("t").over(wb))
        .withColumn("n_less", F.col("offset") + F.col("run") - F.col("t"))
        # doubled average rank of the tie block: 2*n_less + t + 1
        .withColumn("r2", 2 * F.col("n_less") + F.col("t") + 1)
    )
    agg = per.agg(
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.sum(
            (F.col("na").cast("decimal(38,0)") * F.col("r2")).cast(
                "decimal(38,0)"
            )
        ).alias("r2a"),
        F.sum(
            (
                F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
                - F.col("t")
            ).cast("decimal(38,0)")
        ).alias("tie"),
    )
    n1d = F.col("n_a").cast("double")
    n2d = F.col("n_b").cast("double")
    nd = n1d + n2d
    u2 = (
        F.col("r2a")
        - (
            F.col("n_a").cast("decimal(38,0)")
            * (F.col("n_a") + 1).cast("decimal(38,0)")
        ).cast("decimal(38,0)")
    )
    # nd == 1 would make the tie fraction 0/0 (ANSI throw); guard the
    # denominator — the z is NULL in that degenerate case anyway
    # because n1*n2 = 0 forces sigma2 to 0.
    tie_frac = F.when(
        nd > 1.0,
        F.col("tie").cast("double") / (nd * (nd - 1.0)),
    ).otherwise(F.lit(0.0))
    sigma2 = n1d * n2d / 12.0 * ((nd + 1.0) - tie_frac)
    z = F.when(
        sigma2 > 0.0,
        F.floor(
            (u2.cast("double") - n1d * n2d)
            / (2.0 * F.sqrt(sigma2))
            * 1000.0
        ).cast("bigint"),
    )
    return agg.select(
        "n_a",
        "n_b",
        u2.cast("bigint").alias("u2_a"),
        F.col("tie").cast("bigint").alias("tie_term"),
        z.alias("z_milli"),
    )


SQL_STATS_MANN_WHITNEY = f"""
WITH ev AS (
  SELECT value,
         CASE WHEN event_type = '{_MW_GROUP_A}' THEN 1 ELSE 0 END AS is_a
  FROM events
  WHERE event_type IN ('{_MW_GROUP_A}', '{_MW_GROUP_B}')
    AND value IS NOT NULL
),
vb AS (
  SELECT value, sum(is_a) AS na, sum(1 - is_a) AS nb,
         sum(is_a) + sum(1 - is_a) AS t
  FROM ev GROUP BY 1
),
per AS (
  SELECT na, nb, t,
         sum(t) OVER (ORDER BY value
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - t AS n_less
  FROM vb
),
agg AS (
  SELECT CAST(sum(na) AS BIGINT) AS n_a,
         CAST(sum(nb) AS BIGINT) AS n_b,
         sum(CAST(na AS HUGEINT) * (2 * n_less + t + 1)) AS r2a,
         sum(CAST(t AS HUGEINT) * t * t - t) AS tie
  FROM per
)
SELECT n_a, n_b,
       CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2_a,
       CAST(tie AS BIGINT) AS tie_term,
       CAST(floor(
         (CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE)
          - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
         / NULLIF(2.0 * sqrt(
             CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
             * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
                - CASE WHEN n_a + n_b > 1 THEN
                    CAST(tie AS DOUBLE)
                    / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                       * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                          - 1.0))
                  ELSE 0.0 END)
           ), 0.0)
         * 1000.0) AS BIGINT) AS z_milli
FROM agg
"""


# --------------------------------------------------------------------
# segmented type-token ratio (windowed lexical diversity)
# --------------------------------------------------------------------

_TTR_SEG = 50


def q_text_ttr_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document segmented type-token ratio: tokens split into
    consecutive 50-token segments, per-segment distinct/total ratio
    (ppm), averaged per document (the windowed TTR underlying MTLD —
    length-invariant where raw TTR decays with doc length).

    Scale: tokenize + position map-side, two doc-keyed aggregates —
    no windows, no joins; everything partitions by doc_id.  Ratios
    stay integer ppm via truncating div on both engines (segment
    numerators cap at 50e6, far under 2^63)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda x: x != F.lit(""),
            )
        ).alias("pos", "tok"),
    )
    seg = (
        docs.withColumn("seg", F.expr(f"pos DIV {_TTR_SEG}"))
        .groupBy("doc_id", "seg")
        .agg(
            F.countDistinct("tok").alias("types"),
            F.count(F.lit(1)).alias("toks"),
        )
        .withColumn(
            "seg_ttr_ppm",
            F.expr("(types * 1000000) DIV toks"),
        )
    )
    return (
        seg.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.expr("sum(seg_ttr_ppm) DIV count(1)").alias("mean_ttr_ppm"),
        )
        .orderBy("doc_id")
    )


SQL_TEXT_TTR_SEGMENTS = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'), 1)
           - 1 AS pos
  FROM documents
),
seg AS (
  SELECT doc_id, pos // {_TTR_SEG} AS seg,
         count(DISTINCT tok) AS types, count(*) AS toks
  FROM toks GROUP BY 1, 2
),
per AS (
  SELECT doc_id, seg, (types * 1000000) // toks AS seg_ttr_ppm FROM seg
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(seg_ttr_ppm) // count(*) AS BIGINT) AS mean_ttr_ppm
FROM per GROUP BY 1 ORDER BY doc_id
"""


# --------------------------------------------------------------------
# shard manifest (greedy byte-budget packing, per-source sequential)
# --------------------------------------------------------------------

_SHARD_TARGET_BYTES = 2000


def q_multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest: documents packed greedily into
    ~2 KB shards in doc_id order WITHIN each source (sharded tar
    exports are laid out per-subcorpus in practice).

    Scale: the cumulative byte sum is a window PARTITIONED by source
    — no global ordering exists at any corpus size; shard ids fall
    out of a truncating div on the exclusive running total, and the
    manifest is one (source, shard) aggregate."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sharded = docs.withColumn(
        "cum_prev", F.sum("n_chars").over(w)
    ).withColumn(
        "shard",
        F.expr(f"coalesce(cum_prev, 0) DIV {_SHARD_TARGET_BYTES}"),
    )
    return (
        sharded.groupBy("source", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("bytes"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .orderBy("source", "shard")
    )


SQL_MULTIMODAL_SHARD_MANIFEST = f"""
WITH sharded AS (
  SELECT doc_id, source, n_chars,
         CAST(COALESCE(sum(n_chars) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) // {_SHARD_TARGET_BYTES} AS BIGINT) AS shard
  FROM documents
)
SELECT source, shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS bytes,
       min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
FROM sharded GROUP BY 1, 2 ORDER BY source, shard
"""


QUERIES: dict[str, QuerySpec] = {
    "basket_association_rules": QuerySpec(
        q_basket_association_rules, SQL_BASKET_ASSOCIATION_RULES
    ),
    "agg_gini": QuerySpec(q_agg_gini, SQL_AGG_GINI),
    "stats_mann_whitney": QuerySpec(
        q_stats_mann_whitney, SQL_STATS_MANN_WHITNEY
    ),
    "text_ttr_segments": QuerySpec(
        q_text_ttr_segments, SQL_TEXT_TTR_SEGMENTS
    ),
    "multimodal_shard_manifest": QuerySpec(
        q_multimodal_shard_manifest, SQL_MULTIMODAL_SHARD_MANIFEST
    ),
}
