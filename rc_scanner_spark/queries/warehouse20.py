"""Round-7 batch 28: corpus-composition and drift diagnostics.

Why these belong in a 100 TB training-data engine:

* ``text_lang_confusion`` — the confusion matrix of declared vs
  predicted language is the standing QA report for any multilingual
  corpus: a source whose declared 'de' rows predict 'en' is mislabeled
  upstream.  One grouped aggregate over bounded (lang x lang) cells.
* ``embed_centroid_drift`` — per-label cosine between the centroids of
  two corpus halves (even/odd vec_id as the refresh proxy): the
  embedding-space drift monitor run after every re-embedding job.
* ``graph_clustering_coefficient`` — local clustering coefficient per
  node on the shared co-purchase graph, profiled by degree: separates
  clique-like neighborhoods from hub-and-spoke ones, the standard
  second-order graph-health statistic after triangle counts.
* ``agg_theil_index`` — Theil T inequality of customer spend per
  market segment: like ``agg_gini`` but additively decomposable, the
  concentration number that is exact under distribution.
* ``select_mix_planner`` — the data-mix planning table: given a token
  budget split uniformly across sources, the per-source sampling rate
  (ppm) and epoch count needed to deliver its allocation — the
  arithmetic behind every "n epochs of source X" training-mix decision.

Engine-parity notes: counts and cents are exact integer sums
(order-free); ratios/shares are double-first ppm floors; Theil terms
integer-ize per customer BEFORE summation (the order-independent
float-sum pattern); centroid cosines follow the embed_label_separation
recipe (1e-6 component grid, 1e-4 cosine snap); integer division uses
DIV / ``//`` (both truncate toward zero).

Reference scope note: the reference engine (scanner.py:120-175) has no
analytics surface; extends SURVEY.md §2.B's text / embedding / graph /
warehouse / LLM-selection categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, cosine
from ..operators.text import LANG_MARKERS, lang_id, token_count
from . import QuerySpec, load_tuned
from .warehouse2 import _SQL_EDGES_CTE, _copurchase_edges

_t = load_tuned
_M = LANG_MARKERS


# --------------------------------------------------------------------
# declared-vs-predicted language confusion matrix
# --------------------------------------------------------------------


def q_text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the declared ``lang`` column against the
    stopword-marker ``lang_id`` prediction, with the within-declared
    row share in ppm.

    Scale: lang scoring is map-side regex counting; the aggregate is
    over (lang x lang) cells — bounded by language cardinality, not
    corpus size; the share window partitions by declared lang over
    those cells."""
    d = _t(spark, sf_dir, "documents")
    cells = (
        d.select(
            F.col("lang").alias("lang_declared"),
            lang_id(F.col("text")).alias("lang_pred"),
        )
        .groupBy("lang_declared", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("lang_declared")
    return (
        cells.withColumn("t", F.sum("n_docs").over(w))
        .select(
            "lang_declared",
            "lang_pred",
            "n_docs",
            F.floor(
                F.col("n_docs").cast("double")
                * 1000000.0
                / F.col("t").cast("double")
            )
            .cast("bigint")
            .alias("row_share_ppm"),
        )
        .orderBy("lang_declared", "lang_pred")
    )


SQL_TEXT_LANG_CONFUSION = f"""
WITH s AS (
  SELECT lang AS lang_declared,
         len(regexp_extract_all(lower(text), '{_M["en"]}')) AS s_en,
         len(regexp_extract_all(lower(text), '{_M["de"]}')) AS s_de,
         len(regexp_extract_all(lower(text), '{_M["fr"]}')) AS s_fr,
         len(regexp_extract_all(lower(text), '{_M["es"]}')) AS s_es,
         len(regexp_extract_all(text, '[一-鿿]')) AS s_zh
  FROM documents
),
pred AS (
  SELECT lang_declared,
         CASE WHEN s_zh > 0 THEN 'zh'
              WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
              WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
              WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
              WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
              WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
              ELSE 'und' END AS lang_pred
  FROM s
),
cells AS (
  SELECT lang_declared, lang_pred, count(*) AS n_docs
  FROM pred GROUP BY 1, 2
)
SELECT lang_declared, lang_pred, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(floor(CAST(n_docs AS DOUBLE) * 1000000.0
                  / CAST(sum(n_docs) OVER (PARTITION BY lang_declared)
                         AS DOUBLE)) AS BIGINT) AS row_share_ppm
FROM cells ORDER BY lang_declared, lang_pred
"""


# --------------------------------------------------------------------
# per-label centroid drift between corpus halves
# --------------------------------------------------------------------


def q_embed_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label cosine between the centroid of even-vec_id members and
    the centroid of odd-vec_id members — the drift check run between
    two embedding refreshes (the parity split stands in for the
    before/after snapshots the driver schema lacks).

    Determinism (embed_label_separation recipe): per-dim means from
    exact integer sums on a 1e-6 grid; the single cosine per label is
    snapped to a 1e-4 grid before the ppm scale-up.

    Scale: one (label, half, dim) aggregate (rows = labels x 2 x
    dims), centroid assembly via collect_list over those bounded rows,
    one equi-join on label — no windows, no cartesians."""
    e = _t(spark, sf_dir, "embeddings")
    v = e.select(
        (F.col("vec_id") % 2).alias("half"),
        "label",
        as_double_array(F.col("embedding")).alias("v"),
    )
    grid = v.select(
        "label", "half", F.posexplode("v").alias("pos", "x")
    ).select(
        "label",
        "half",
        "pos",
        F.floor(F.col("x") * 1e6 + 0.5).cast("long").alias("g6"),
    )
    dims = grid.groupBy("label", "half", "pos").agg(
        F.sum("g6").alias("s6"), F.count(F.lit(1)).alias("n")
    )
    cent = dims.groupBy("label", "half").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("pos", (F.col("s6") / F.col("n") / 1e6).alias("m"))
                )
            ),
            lambda r: r["m"],
        ).alias("cv"),
        F.max("n").alias("n"),
    )
    ev = cent.filter(F.col("half") == 0).select(
        "label", F.col("cv").alias("ecv"), F.col("n").alias("n_even")
    )
    od = cent.filter(F.col("half") == 1).select(
        "label", F.col("cv").alias("ocv"), F.col("n").alias("n_odd")
    )
    return (
        ev.join(od, "label")
        .select(
            "label",
            "n_even",
            "n_odd",
            (
                F.floor(
                    cosine(F.col("ecv"), F.col("ocv")) * 10000 + 0.5
                ).cast("long")
                * 100
            ).alias("drift_cos_ppm"),
        )
        .orderBy("label")
    )


SQL_EMBED_CENTROID_DRIFT = """
WITH v AS (
  SELECT vec_id % 2 AS half, label, embedding::DOUBLE[] AS v
  FROM embeddings
),
grid AS (
  SELECT label, half, generate_subscripts(v, 1) - 1 AS pos,
         CAST(floor(unnest(v) * 1e6 + 0.5) AS BIGINT) AS g6
  FROM v
),
dims AS (
  SELECT label, half, pos, sum(g6) AS s6, count(*) AS n
  FROM grid GROUP BY 1, 2, 3
),
cent AS (
  SELECT label, half,
         list(CAST(s6 AS DOUBLE) / n / 1e6 ORDER BY pos) AS cv,
         max(n) AS n
  FROM dims GROUP BY 1, 2
)
SELECT e.label, CAST(e.n AS BIGINT) AS n_even, CAST(o.n AS BIGINT) AS n_odd,
       CASE WHEN list_dot_product(e.cv, e.cv) != 0
             AND list_dot_product(o.cv, o.cv) != 0
            THEN CAST(floor(list_cosine_similarity(e.cv, o.cv) * 10000 + 0.5)
                      AS BIGINT) * 100
       END AS drift_cos_ppm
FROM cent e JOIN cent o ON e.label = o.label AND e.half = 0 AND o.half = 1
ORDER BY e.label
"""


# --------------------------------------------------------------------
# local clustering coefficient profile by degree
# --------------------------------------------------------------------


def q_graph_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Average local clustering coefficient per degree on the shared
    co-purchase graph: for each node with degree >= 2,
    coeff = 2 * triangles(node) / (deg * (deg - 1)), averaged over the
    nodes of each degree.

    Scale: reuses the persisted support-pruned edge frame
    (warehouse2._copurchase_edges — shared with triangles / k-core /
    link prediction) and the oriented a<b<c enumeration, so the heavy
    joins are the ALREADY-PROBED triangle joins; degrees are one
    union-all aggregate; the final profile is bounded by distinct
    degree values, not node count.  Per-node coefficients integer-ize
    to ppm before the exact-integer DIV mean."""
    edges = _copurchase_edges(spark, sf_dir)
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.pb") == F.col("e2.pa"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa"))
            & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("x"),
            F.col("e1.pb").alias("y"),
            F.col("e2.pb").alias("z"),
        )
    )
    tri_n = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    deg = (
        edges.select(F.col("pa").alias("part"))
        .unionAll(edges.select(F.col("pb").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    node = (
        deg.filter(F.col("deg") >= 2)
        .join(tri_n, "part", "left")
        .select(
            "deg",
            F.floor(
                F.coalesce(F.col("n_tri"), F.lit(0)).cast("double")
                * 2.0
                * 1000000.0
                / (F.col("deg") * (F.col("deg") - 1)).cast("double")
            )
            .cast("long")
            .alias("coeff_ppm"),
        )
    )
    return (
        node.groupBy("deg")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.expr("sum(coeff_ppm) DIV count(1)").alias("avg_coeff_ppm"),
        )
        .select(
            F.col("deg").cast("bigint").alias("degree"),
            "n_nodes",
            F.col("avg_coeff_ppm").cast("bigint").alias("avg_coeff_ppm"),
        )
        .orderBy("degree")
    )


SQL_GRAPH_CLUSTERING_COEFFICIENT = f"""
WITH {_SQL_EDGES_CTE},
tri AS (
  SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
  FROM edges e1
  JOIN edges e2 ON e1.pb = e2.pa
  JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
),
tri_n AS (
  SELECT part, count(*) AS n_tri
  FROM (SELECT x AS part FROM tri UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
  GROUP BY 1
),
deg AS (
  SELECT part, count(*) AS deg
  FROM (SELECT pa AS part FROM edges UNION ALL SELECT pb FROM edges)
  GROUP BY 1
),
node AS (
  SELECT deg,
         CAST(floor(CAST(coalesce(n_tri, 0) AS DOUBLE) * 2.0 * 1000000.0
                    / CAST(deg * (deg - 1) AS DOUBLE)) AS BIGINT)
           AS coeff_ppm
  FROM deg LEFT JOIN tri_n USING (part)
  WHERE deg >= 2
)
SELECT CAST(deg AS BIGINT) AS degree,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(coeff_ppm) // count(*) AS BIGINT) AS avg_coeff_ppm
FROM node GROUP BY 1 ORDER BY degree
"""


# --------------------------------------------------------------------
# Theil T inequality of customer spend per market segment
# --------------------------------------------------------------------


def q_agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T index of per-customer spend within each market segment:
    T = mean over customers of (x/mu) * ln(x/mu).  Complements
    ``agg_gini``: Theil decomposes additively across subgroups, so the
    per-segment values roll up exactly.

    Determinism: spend is exact integer cents; each customer's term is
    ONE closed-form float chain (identical op order both engines, the
    JSD/log idiom) integer-ized to ppb BEFORE the sum, so partial-
    aggregation order can never drift the statistic; the final mean is
    an exact integer DIV.

    Scale: one custkey aggregate over orders, a key join to customer,
    one segment aggregate, the tiny per-segment totals broadcast back
    by equi-join — no windows, no cartesians."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    spend = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).alias("cents")
    )
    # Theil is defined over POSITIVE incomes: a zero-cents customer
    # would make F.log(0) NULL on Spark (term silently dropped while n
    # still counts it) and throw on DuckDB — exclude on both sides
    # (review r7).
    seg = (
        spend.filter(F.col("cents") > 0)
        .join(cust, spend.o_custkey == cust.c_custkey)
        .select("segment", "cents")
    )
    tot = seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    mu = F.col("s").cast("double") / F.col("n")
    ratio = F.col("cents").cast("double") / mu
    terms = seg.join(tot, "segment").select(
        "segment",
        "n",
        F.floor(ratio * F.log(ratio) * 1e9 + 0.5).cast("long").alias("t_ppb"),
    )
    return (
        terms.groupBy("segment", "n")
        .agg(F.expr("sum(t_ppb) DIV n").alias("theil_ppb"))
        .select(
            "segment",
            F.col("n").cast("bigint").alias("n_customers"),
            F.col("theil_ppb").cast("bigint").alias("theil_ppb"),
        )
        .orderBy("segment")
    )


SQL_AGG_THEIL_INDEX = """
WITH spend AS (
  SELECT o_custkey,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
seg AS (
  SELECT c_mktsegment AS segment, cents
  FROM spend JOIN customer ON c_custkey = o_custkey
  WHERE cents > 0
),
tot AS (
  SELECT segment, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s
  FROM seg GROUP BY 1
),
terms AS (
  SELECT seg.segment, tot.n,
         CAST(floor((CAST(cents AS DOUBLE) / (CAST(s AS DOUBLE) / n))
                    * ln(CAST(cents AS DOUBLE) / (CAST(s AS DOUBLE) / n))
                    * 1e9 + 0.5) AS BIGINT) AS t_ppb
  FROM seg JOIN tot USING (segment)
)
SELECT segment, CAST(n AS BIGINT) AS n_customers,
       CAST(sum(t_ppb) // n AS BIGINT) AS theil_ppb
FROM terms GROUP BY segment, n ORDER BY segment
"""


# --------------------------------------------------------------------
# training-mix sampling-plan table
# --------------------------------------------------------------------

_MIX_BUDGET_TOKENS = 100_000  # planning budget, split uniformly


def q_select_mix_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling plan for a uniform-share token budget: each
    source's allocation (budget DIV n_sources), the sampling rate in
    ppm needed to hit it (capped at 1e6 when the source is too small),
    and the epoch count an oversampled source must repeat.

    Scale: one source aggregate over map-side token counts; the 1-row
    source-count scalar broadcasts back (pinned cartesian).  Sources
    with zero tokens are excluded (cannot be sampled, and ANSI DIV by
    zero would throw)."""
    d = _t(spark, sf_dir, "documents")
    per_src = (
        d.select("source", token_count(F.col("text")).alias("tk"))
        .groupBy("source")
        .agg(F.sum(F.col("tk").cast("long")).alias("tokens_available"))
        .filter(F.col("tokens_available") > 0)
    )
    nsrc = per_src.agg(F.count(F.lit(1)).alias("n_sources"))
    alloc = F.expr(f"{_MIX_BUDGET_TOKENS} DIV n_sources")
    return (
        per_src.crossJoin(F.broadcast(nsrc))
        .select(
            "source",
            "tokens_available",
            alloc.cast("bigint").alias("alloc_tokens"),
            F.least(
                F.lit(1000000).cast("bigint"),
                F.floor(
                    alloc.cast("double")
                    * 1000000.0
                    / F.col("tokens_available").cast("double")
                ).cast("bigint"),
            ).alias("rate_ppm"),
            F.when(alloc <= F.col("tokens_available"), F.lit(1).cast("bigint"))
            .otherwise(
                F.expr(
                    f"({_MIX_BUDGET_TOKENS} DIV n_sources"
                    " + tokens_available - 1) DIV tokens_available"
                ).cast("bigint")
            )
            .alias("epochs"),
        )
        .orderBy("source")
    )


SQL_SELECT_MIX_PLANNER = f"""
WITH per_src AS (
  SELECT source,
         CAST(sum(len(regexp_extract_all(text, '[^ \\t\\n\\x0B\\f\\r]+')))
              AS BIGINT) AS tokens_available
  FROM documents GROUP BY 1
  HAVING sum(len(regexp_extract_all(text, '[^ \\t\\n\\x0B\\f\\r]+'))) > 0
),
nsrc AS (SELECT count(*) AS n_sources FROM per_src)
SELECT source, tokens_available,
       CAST({_MIX_BUDGET_TOKENS} // n_sources AS BIGINT) AS alloc_tokens,
       CAST(least(1000000,
                  floor(CAST({_MIX_BUDGET_TOKENS} // n_sources AS DOUBLE)
                        * 1000000.0 / CAST(tokens_available AS DOUBLE)))
            AS BIGINT) AS rate_ppm,
       CAST(CASE WHEN {_MIX_BUDGET_TOKENS} // n_sources <= tokens_available
                 THEN 1
                 ELSE ({_MIX_BUDGET_TOKENS} // n_sources
                       + tokens_available - 1) // tokens_available
            END AS BIGINT) AS epochs
FROM per_src, nsrc ORDER BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "text_lang_confusion": QuerySpec(
        q_text_lang_confusion, SQL_TEXT_LANG_CONFUSION
    ),
    "embed_centroid_drift": QuerySpec(
        q_embed_centroid_drift, SQL_EMBED_CENTROID_DRIFT
    ),
    "graph_clustering_coefficient": QuerySpec(
        q_graph_clustering_coefficient, SQL_GRAPH_CLUSTERING_COEFFICIENT
    ),
    "agg_theil_index": QuerySpec(q_agg_theil_index, SQL_AGG_THEIL_INDEX),
    "select_mix_planner": QuerySpec(
        q_select_mix_planner, SQL_SELECT_MIX_PLANNER
    ),
}
