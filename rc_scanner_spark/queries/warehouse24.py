"""Round-7 batch 32: shrinkage scoring, seasonal anomaly, fertility,
cross-modal consistency.

Why these belong in a 100 TB training-data engine:

* ``agg_bayes_shrunken_rates`` — empirical-Bayes shrinkage of each
  source's quality-pass rate toward the corpus rate (strength m=50):
  the small-sample-safe way to SCORE sources (a 3-doc source with 3
  passes must not outrank a 10k-doc source at 95%), complementing the
  p-chart's flagging role.
* ``events_anomaly_seasonal_adjusted`` — daily count anomalies AFTER
  removing day-of-week seasonality (residual vs the type's dow mean,
  flagged at 3 robust MADs): the monitor that doesn't page every
  Saturday.  Composes events_dow_seasonality's profile with
  events_rate_anomaly's flagging.
* ``text_tokenizer_fertility`` — characters per BPE-ish token per
  language: the tokenizer-efficiency number that decides vocabulary
  allocation for multilingual training.
* ``embed_dup_consistency`` — for exact-duplicate documents (same
  normalized fingerprint), the cosine between the pair's embeddings,
  summarized in one always-present audit row: duplicate text with
  dissimilar embeddings means the embedding job and the dedup disagree
  about the corpus.

Engine-parity notes: exact integer counts; one-float-chain ppm floors;
residual medians/MADs via the exact percentile/quantile_cont idiom;
dup pairs are CONSECUTIVE ids within a fingerprint group (lead() over
the fp partition — linear in group size, never all-pairs); cosine
snaps to 1e-4 (NULL for zero-norm vectors, guard mirrored in the
twin) before the fixed 0.9/0.5 high/low thresholds.

Reference scope note: the reference engine (scanner.py:120-175) has no
analytics surface; extends SURVEY.md §2.B's aggregation / events /
text / embedding categories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, cosine
from ..operators.text import BPE_RE, bpe_token_count, fingerprint, quality_score
from . import QuerySpec, load_tuned
from .llm import sql_quality_ctes

_t = load_tuned

_EB_STRENGTH = 50
_QUALITY_GATE = 0.35


def q_agg_bayes_shrunken_rates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source quality-pass rate with empirical-Bayes shrinkage
    toward the corpus rate: eb = (k + m*pbar) / (n + m), m=50.

    Scale: one source aggregate over the map-side quality gate; the
    1-row corpus totals broadcast back (pinned cartesian)."""
    d = _t(spark, sf_dir, "documents")
    gated = d.select(
        "source",
        F.when(quality_score(F.col("text")) >= _QUALITY_GATE, 1)
        .otherwise(0)
        .alias("p"),
    )
    per_src = gated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("p").alias("n_pass")
    )
    tot = per_src.agg(
        F.sum("n_docs").alias("nn"), F.sum("n_pass").alias("kk")
    )
    pbar = F.col("kk").cast("double") / F.col("nn").cast("double")
    eb = (F.col("n_pass") + _EB_STRENGTH * pbar) / (
        F.col("n_docs") + _EB_STRENGTH
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.col("n_pass").cast("bigint").alias("n_pass"),
            F.floor(
                F.col("n_pass").cast("double")
                * 1000000.0
                / F.col("n_docs").cast("double")
            )
            .cast("bigint")
            .alias("raw_ppm"),
            F.floor(eb * 1000000.0).cast("bigint").alias("eb_ppm"),
        )
        .orderBy("source")
    )


SQL_AGG_BAYES_SHRUNKEN_RATES = f"""
WITH {sql_quality_ctes(extra_cols="source")},
per_src AS (
  SELECT source, count(*) AS n_docs,
         sum(CASE WHEN quality >= {_QUALITY_GATE} THEN 1 ELSE 0 END) AS n_pass
  FROM q GROUP BY 1
),
tot AS (SELECT sum(n_docs) AS nn, sum(n_pass) AS kk FROM per_src)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_pass AS BIGINT) AS n_pass,
       CAST(floor(CAST(n_pass AS DOUBLE) * 1000000.0
                  / CAST(n_docs AS DOUBLE)) AS BIGINT) AS raw_ppm,
       CAST(floor((n_pass + {_EB_STRENGTH} * (CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)))
                  / (n_docs + {_EB_STRENGTH}) * 1000000.0) AS BIGINT) AS eb_ppm
FROM per_src, tot ORDER BY source
"""


def q_events_anomaly_seasonal_adjusted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Day-of-week-adjusted daily anomaly flags per event type: the
    residual of each day's count against its type's dow mean, flagged
    where |residual - median| exceeds 3 robust MADs.

    Scale: day and (type, dow) aggregates are bounded by the calendar;
    medians/MADs are per-type exact percentiles over O(days) rows; all
    joins broadcast the tiny profile frames.  weekday(to_date(day))
    keys the profile identically to DuckDB's isodow - 1 (Mon=0), the
    hash-verified r6 idiom."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.weekday(F.to_date("ts")).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    dow_mean = daily.groupBy("event_type", "dow").agg(
        F.avg("n").alias("mu")
    )
    resid = daily.join(F.broadcast(dow_mean), ["event_type", "dow"]).select(
        "event_type", "day", "n", (F.col("n") - F.col("mu")).alias("r")
    )
    med = resid.groupBy("event_type").agg(
        F.expr("percentile(r, 0.5)").alias("med")
    )
    with_med = resid.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.expr("percentile(abs(r - med), 0.5)").alias("mad")
    )
    flagged = (
        with_med.join(F.broadcast(mad), "event_type")
        .withColumn(
            "excess_r", F.round(F.abs(F.col("r") - F.col("med")) - 3 * F.col("mad"), 4)
        )
        .filter(F.col("excess_r") > 0)
    )
    return flagged.select(
        "event_type",
        "day",
        F.col("n").cast("bigint").alias("n"),
        F.round("r", 4).alias("resid_r"),
        "excess_r",
    ).orderBy("event_type", "day")


SQL_EVENTS_ANOMALY_SEASONAL_ADJUSTED = """
WITH daily AS (
  SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         isodow(CAST(ts AS DATE)) - 1 AS dow, count(*) AS n
  FROM events GROUP BY 1, 2, 3
),
dow_mean AS (
  SELECT event_type, dow, avg(n) AS mu FROM daily GROUP BY 1, 2
),
resid AS (
  SELECT d.event_type, d.day, d.n, d.n - mu AS r
  FROM daily d JOIN dow_mean USING (event_type, dow)
),
med AS (
  SELECT event_type, quantile_cont(r, 0.5) AS med FROM resid GROUP BY 1
),
wm AS (SELECT resid.*, med FROM resid JOIN med USING (event_type)),
mad AS (
  SELECT event_type, quantile_cont(abs(r - med), 0.5) AS mad
  FROM wm GROUP BY 1
)
SELECT event_type, day, CAST(n AS BIGINT) AS n,
       round(r, 4) AS resid_r,
       round(abs(r - med) - 3 * mad, 4) AS excess_r
FROM wm JOIN mad USING (event_type)
WHERE round(abs(r - med) - 3 * mad, 4) > 0
ORDER BY event_type, day
"""


def q_text_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility per language: characters per BPE-ish token
    — the per-language efficiency number behind vocabulary-allocation
    decisions (CJK text at ~1 char/token vs latin at ~4 means the
    vocabulary is under-serving one of them).

    Scale: map-side counts, one language aggregate."""
    d = _t(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        F.length("text").cast("long").alias("c"),
        bpe_token_count(F.col("text")).cast("long").alias("t"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("c").alias("n_chars"),
            F.sum("t").alias("n_bpe_tokens"),
        )
        .filter(F.col("n_bpe_tokens") > 0)
        .select(
            "lang",
            "n_docs",
            "n_chars",
            "n_bpe_tokens",
            F.floor(
                F.col("n_chars").cast("double")
                * 1000000.0
                / F.col("n_bpe_tokens").cast("double")
            )
            .cast("bigint")
            .alias("chars_per_token_ppm"),
        )
        .orderBy("lang")
    )


# BPE_RE is interpolated from the shared constant so the twin follows
# the Spark side (operators/text.py) if the tokenizer ever changes.
SQL_TEXT_TOKENIZER_FERTILITY = f"""
WITH per_doc AS (
  SELECT lang, CAST(length(text) AS BIGINT) AS c,
         CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS t
  FROM documents
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(c) AS BIGINT) AS n_chars,
       CAST(sum(t) AS BIGINT) AS n_bpe_tokens,
       CAST(floor(CAST(sum(c) AS DOUBLE) * 1000000.0
                  / CAST(sum(t) AS DOUBLE)) AS BIGINT) AS chars_per_token_ppm
FROM per_doc GROUP BY 1 HAVING sum(t) > 0 ORDER BY lang
"""


def q_embed_dup_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal consistency of exact duplicates: for consecutive
    id pairs within each normalized-fingerprint duplicate group, the
    cosine of the pair's embeddings, summarized in ONE audit row
    (pair count, high/low-similarity counts, min/max cosine s4) —
    identical text with dissimilar vectors means the embedding job
    disagrees with the dedup about the corpus.  A corpus with no
    exact dups reports (0, 0, 0, NULL, NULL) rather than vanishing.

    Scale: pairs are CONSECUTIVE ids per fp group (lead() over the fp
    partition — linear in group size, never all-pairs); two key joins
    to embeddings; one global aggregate over the pair rows."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    pairs = (
        d.withColumn("id_b", F.lead("doc_id").over(w))
        .filter(F.col("id_b").isNotNull())
        .select(F.col("doc_id").alias("id_a"), "id_b")
    )
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    scored = (
        pairs.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            F.floor(cosine(F.col("va"), F.col("vb")) * 10000 + 0.5)
            .cast("long")
            .alias("s4")
        )
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("s4") >= 9000, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_high"),
        F.coalesce(
            F.sum(F.when(F.col("s4") < 5000, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_low"),
        F.min("s4").alias("min_s4"),
        F.max("s4").alias("max_s4"),
    )


SQL_EMBED_DUP_CONSISTENCY = """
WITH d AS (
  SELECT doc_id,
         substring(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 16)
             AS fp
  FROM documents
),
pairs AS (
  SELECT doc_id AS id_a,
         lead(doc_id) OVER (PARTITION BY fp ORDER BY doc_id) AS id_b
  FROM d
  QUALIFY id_b IS NOT NULL
),
scored AS (
  SELECT CASE WHEN list_dot_product(ea.embedding::DOUBLE[],
                                    ea.embedding::DOUBLE[]) != 0
               AND list_dot_product(eb.embedding::DOUBLE[],
                                    eb.embedding::DOUBLE[]) != 0
              THEN CAST(floor(list_cosine_similarity(ea.embedding::DOUBLE[],
                                                     eb.embedding::DOUBLE[])
                              * 10000 + 0.5) AS BIGINT)
         END AS s4
  FROM pairs
  JOIN embeddings ea ON ea.vec_id = id_a
  JOIN embeddings eb ON eb.vec_id = id_b
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(coalesce(sum(CASE WHEN s4 >= 9000 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_high,
       CAST(coalesce(sum(CASE WHEN s4 < 5000 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_low,
       CAST(min(s4) AS BIGINT) AS min_s4,
       CAST(max(s4) AS BIGINT) AS max_s4
FROM scored
"""


QUERIES: dict[str, QuerySpec] = {
    "agg_bayes_shrunken_rates": QuerySpec(
        q_agg_bayes_shrunken_rates, SQL_AGG_BAYES_SHRUNKEN_RATES
    ),
    "events_anomaly_seasonal_adjusted": QuerySpec(
        q_events_anomaly_seasonal_adjusted,
        SQL_EVENTS_ANOMALY_SEASONAL_ADJUSTED,
    ),
    "text_tokenizer_fertility": QuerySpec(
        q_text_tokenizer_fertility, SQL_TEXT_TOKENIZER_FERTILITY
    ),
    "embed_dup_consistency": QuerySpec(
        q_embed_dup_consistency, SQL_EMBED_DUP_CONSISTENCY
    ),
}
