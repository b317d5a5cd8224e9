"""Round-6 batch 26: degree assortativity and word-length profiling.

Why these belong in a 100 TB training-data engine:

* ``graph_degree_assortativity`` — the degree-degree Pearson
  correlation over edges says whether hubs link to hubs (assortative,
  r > 0) or to leaves (disassortative, r < 0) — the one-number
  topology summary that decides whether hub-capping is needed before
  graph-expanded retrieval.  Closed form over exact integer moment
  sums on the shared pruned co-purchase edges (both orientations, the
  standard symmetric treatment).
* ``text_word_length_profile`` — per-source word-length mean/std and
  long-word share separate prose from identifier soup and broken
  tokenization; one tokenize-explode plus a grouped aggregate of
  exact integer sums.

Engine-parity notes: both ops are exact-integer moment sums
(decimal/HUGEINT) with identical double chains only in the final
correlation/std floors; zero-variance degenerate cases are
when()/CASE-guarded on both sides.

Reference scope note: the reference engine (scanner.py:120-175) has
no analytics surface; extends SURVEY.md §2.B's graph / text
categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned
from .warehouse2 import _SQL_EDGES_CTE, _copurchase_edges

_t = load_tuned


def q_graph_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity of the co-purchase graph: Pearson r of
    (deg(a), deg(b)) over directed edge endpoints (both orientations
    — the standard symmetric form), from exact integer moment sums;
    one row: edge count and r in milli.

    Scale: reuses the SAME support-pruned persisted edge frame as the
    rest of the graph family; degrees are one grouped count joined
    back on the node key — NO broadcast hint, the degree table is
    node-sized (data-sized, not a bounded dim; AQE auto-broadcasts
    when it fits — review r8 round 6); moments ride decimal(38,0)
    and only the final r chain is double."""
    edges = _copurchase_edges(spark, sf_dir)
    und = edges.union(
        edges.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"))
    )
    deg = und.groupBy(F.col("pa").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    da = deg.select(F.col("node").alias("pa"), F.col("deg").alias("dx"))
    db = deg.select(F.col("node").alias("pb"), F.col("deg").alias("dy"))
    pairs = und.join(da, "pa").join(db, "pb")
    m = pairs.agg(
        F.count(F.lit(1)).alias("n_endpoints"),
        F.sum(F.col("dx").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("dy").cast("decimal(38,0)")).alias("sy"),
        F.sum(
            (F.col("dx").cast("decimal(38,0)") * F.col("dx")).cast(
                "decimal(38,0)"
            )
        ).alias("sxx"),
        F.sum(
            (F.col("dy").cast("decimal(38,0)") * F.col("dy")).cast(
                "decimal(38,0)"
            )
        ).alias("syy"),
        F.sum(
            (F.col("dx").cast("decimal(38,0)") * F.col("dy")).cast(
                "decimal(38,0)"
            )
        ).alias("sxy"),
    )
    nd = F.col("n_endpoints").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    den = F.sqrt(
        F.greatest(nd * sxx - sx * sx, F.lit(0.0))
    ) * F.sqrt(F.greatest(nd * syy - sy * sy, F.lit(0.0)))
    return m.select(
        F.col("n_endpoints").alias("n_edge_endpoints"),
        F.when(
            den > 0.0,
            F.floor((nd * sxy - sx * sy) / den * 1000.0).cast("bigint"),
        ).alias("assortativity_milli"),
    )


SQL_GRAPH_DEGREE_ASSORTATIVITY = f"""
WITH {_SQL_EDGES_CTE},
und AS (
  SELECT pa, pb FROM edges
  UNION ALL
  SELECT pb AS pa, pa AS pb FROM edges
),
deg AS (SELECT pa AS node, count(*) AS deg FROM und GROUP BY 1),
pairs AS (
  SELECT a.deg AS dx, b.deg AS dy
  FROM und u
  JOIN deg a ON a.node = u.pa
  JOIN deg b ON b.node = u.pb
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_endpoints,
         sum(CAST(dx AS HUGEINT)) AS sx, sum(CAST(dy AS HUGEINT)) AS sy,
         sum(CAST(dx AS HUGEINT) * dx) AS sxx,
         sum(CAST(dy AS HUGEINT) * dy) AS syy,
         sum(CAST(dx AS HUGEINT) * dy) AS sxy
  FROM pairs
)
SELECT n_endpoints AS n_edge_endpoints,
  CASE WHEN sqrt(GREATEST(CAST(n_endpoints AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
            * sqrt(GREATEST(CAST(n_endpoints AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0.0)) > 0.0
  THEN
    CAST(floor((CAST(n_endpoints AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(GREATEST(CAST(n_endpoints AS DOUBLE)
                       * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
                  * sqrt(GREATEST(CAST(n_endpoints AS DOUBLE)
                         * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0.0)))
               * 1000.0) AS BIGINT)
  END AS assortativity_milli
FROM m
"""


_WLP_LONG = 8


def q_text_word_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source word-length profile: token count, mean length
    (milli), population-std length (milli), and the share of words
    with >= 8 chars (ppm) — tokenization-health signals.

    Scale: tokenize-explode map-side, one grouped aggregate of exact
    integer length moments; only the final mean/std chains are
    double, zero-token guard mirrored."""
    toks = _t(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda x: x != F.lit(""),
            )
        ).alias("tok"),
    ).select("source", F.length("tok").cast("bigint").alias("l"))
    m = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("l").cast("decimal(38,0)")).alias("sl"),
        F.sum(
            (F.col("l").cast("decimal(38,0)") * F.col("l")).cast(
                "decimal(38,0)"
            )
        ).alias("sll"),
        F.sum(F.when(F.col("l") >= _WLP_LONG, 1).otherwise(0)).alias(
            "n_long"
        ),
    )
    nd = F.col("n_tokens").cast("double")
    sl, sll = F.col("sl").cast("double"), F.col("sll").cast("double")
    return m.select(
        "source",
        "n_tokens",
        F.floor(sl / nd * 1000.0).cast("bigint").alias("mean_len_milli"),
        F.floor(
            F.sqrt(F.greatest((nd * sll - sl * sl) / (nd * nd), F.lit(0.0)))
            * 1000.0
        )
        .cast("bigint")
        .alias("std_len_milli"),
        F.expr("CAST((n_long * 1000000) DIV n_tokens AS BIGINT)").alias(
            "long_word_ppm"
        ),
    ).orderBy("source")


SQL_TEXT_WORD_LENGTH_PROFILE = f"""
WITH toks AS (
  SELECT source,
         length(unnest(regexp_extract_all(lower(text), '[a-z]+'))) AS l
  FROM documents
),
m AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         sum(CAST(l AS HUGEINT)) AS sl,
         sum(CAST(l AS HUGEINT) * l) AS sll,
         sum(CASE WHEN l >= {_WLP_LONG} THEN 1 ELSE 0 END) AS n_long
  FROM toks GROUP BY 1
)
SELECT source, n_tokens,
       CAST(floor(CAST(sl AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1000.0)
            AS BIGINT) AS mean_len_milli,
       CAST(floor(sqrt(GREATEST(
              (CAST(n_tokens AS DOUBLE) * CAST(sll AS DOUBLE)
               - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE))
              / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)),
              0.0)) * 1000.0) AS BIGINT) AS std_len_milli,
       CAST((n_long * 1000000) // n_tokens AS BIGINT) AS long_word_ppm
FROM m ORDER BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "graph_degree_assortativity": QuerySpec(
        q_graph_degree_assortativity, SQL_GRAPH_DEGREE_ASSORTATIVITY
    ),
    "text_word_length_profile": QuerySpec(
        q_text_word_length_profile, SQL_TEXT_WORD_LENGTH_PROFILE
    ),
}
