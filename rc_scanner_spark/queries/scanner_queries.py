"""Scanner-semantics queries: the reference's operators F1-F4 / P1-P5
(SURVEY.md §2.A) replayed over the batch test tables.

``documents`` stands in for fetched wikitext (reference S2,
scanner.py:178-196), ``events`` for the change stream.  The flagship
``scan_pipeline_full`` is the whole eval_change pipeline
(scanner.py:120-175) as one DataFrame chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..filters import FilterSpec
from ..functions.regex import regex_hits, regex_matches
from ..operators.text import fingerprint
from ..scanner import (
    event_message,
    match_message,
    sanitize_filename,
    verb_column,
)
from . import QuerySpec, load_tuned


_t = load_tuned


# The filter-list patterns (analog of examples/filterlist.py:31-32) —
# valid in both java.util.regex and RE2 so the oracle can replay them.
PATTERNS = ["(?i)spark", r"\bvector\b", "merge (batch|scan)"]
_PATTERNS_SQL = "['(?i)spark', '\\bvector\\b', 'merge (batch|scan)']"


def q_scan_attribute_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 (filter_.py:43-47,58): membership predicates incl. the
    injected sites-list analog (user_id IN ...)."""
    ev = _t(spark, sf_dir, "events")
    spec = FilterSpec(
        name="f1",
        streamfilter={"event_type": ("click", "purchase"), "user_id": (3, 13, 23, 33, 43)},
        log_level=0,
        skip_repeats=False,
    )
    return spec.apply_attribute_filter(ev).select("event_id", "event_type", "user_id")


SQL_SCAN_ATTRIBUTE_FILTER = """
SELECT event_id, event_type, user_id FROM events
WHERE event_type IN ('click', 'purchase') AND user_id IN (3, 13, 23, 33, 43)
"""


def q_scan_threshold_disabled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 disabled (max_edits=None passes all, filter_.py:88)."""
    d = _t(spark, sf_dir, "documents")
    spec = FilterSpec(name="f2off", max_edits=None, log_level=0, skip_repeats=False)
    return d.filter(spec.editcount_predicate(F.col("n_chars"))).select(
        "doc_id", "n_chars"
    )


SQL_SCAN_THRESHOLD_DISABLED = """
SELECT doc_id, n_chars FROM documents
WHERE CAST(NULL AS BIGINT) IS NULL OR n_chars <= CAST(NULL AS BIGINT)
"""


def q_scan_regex_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 (filter_.py:110-112): per-document array of the patterns that
    matched (not a boolean) — one codegen'd rlike per pattern."""
    d = _t(spark, sf_dir, "documents")
    hits = regex_hits(F.col("text"), PATTERNS)
    return (
        d.withColumn("hits", hits)
        .filter(F.size("hits") > 0)
        .select(
            "doc_id",
            F.size("hits").cast("int").alias("n_hits"),
            F.array_join("hits", ",").alias("hits_str"),
        )
    )


SQL_SCAN_REGEX_HITS = f"""
WITH h AS (
  SELECT doc_id,
         [p FOR p IN {_PATTERNS_SQL} IF regexp_matches(text, p)] AS hits
  FROM documents
)
SELECT doc_id, CAST(len(hits) AS INTEGER) AS n_hits,
       array_to_string(hits, ',') AS hits_str
FROM h WHERE len(hits) > 0
"""


def q_scan_verb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (scanner.py:145): strip trailing 'e', append 'ed'."""
    ev = _t(spark, sf_dir, "events")
    return ev.select("event_type").distinct().select(
        "event_type", verb_column(F.col("event_type")).alias("verb")
    )


SQL_SCAN_VERB = """
SELECT DISTINCT event_type,
       regexp_replace(event_type, 'e$', '') || 'ed' AS verb
FROM events
"""


def q_scan_message(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 (scanner.py:144-146): '{user} {verb} "{title}" at {dt}.'"""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        event_message(
            F.col("user_id").cast("string"),
            verb_column(F.col("event_type")),
            F.concat(F.lit("event-"), F.col("event_id")),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        ).alias("message"),
    )


SQL_SCAN_MESSAGE = """
SELECT event_id,
       printf('%s %s "%s" at %s.',
              CAST(user_id AS VARCHAR),
              regexp_replace(event_type, 'e$', '') || 'ed',
              'event-' || CAST(event_id AS VARCHAR),
              strftime(ts, '%Y-%m-%d %H:%M:%S')) AS message
FROM events
"""


def q_scan_match_message(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 (scanner.py:148-151): '***MATCH*** with regex(es) `p`, ...:
    <uri>' with pluralization on multiple hits."""
    d = _t(spark, sf_dir, "documents")
    hits = regex_hits(F.col("text"), PATTERNS)
    uri = F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
    return (
        d.withColumn("hits", hits)
        .filter(F.size("hits") > 0)
        .select("doc_id", match_message(F.col("hits"), uri).alias("match_msg"))
    )


SQL_SCAN_MATCH_MESSAGE = f"""
WITH h AS (
  SELECT doc_id,
         [p FOR p IN {_PATTERNS_SQL} IF regexp_matches(text, p)] AS hits
  FROM documents
)
SELECT doc_id,
       '***MATCH*** with regex' || CASE WHEN len(hits) > 1 THEN 'es ' ELSE ' ' END
       || array_to_string(['`' || h || '`' FOR h IN hits], ', ')
       || ': ' || 'doc://' || CAST(doc_id AS VARCHAR) AS match_msg
FROM h WHERE len(hits) > 0
"""


def q_scan_date_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (scanner.py:155): date partition key derivation + count per
    partition (the K4 sink layout, date-partitioned)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("date")).agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_SCAN_DATE_PARTITION = """
SELECT strftime(ts, '%Y-%m-%d') AS date, count(*) AS n
FROM events GROUP BY 1
"""


def q_scan_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 (scanner.py:156-158): '{user}_{revid}' with ':' -> '-'."""
    d = _t(spark, sf_dir, "documents")
    user_like = F.concat(F.lit("User:"), F.col("source"))
    return d.select(
        "doc_id",
        sanitize_filename(user_like, F.col("doc_id")).alias("filename"),
    )


SQL_SCAN_FILENAME = """
SELECT doc_id,
       translate('User:' || source || '_' || CAST(doc_id AS VARCHAR), ':', '-')
           AS filename
FROM documents
"""


def q_scan_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 keep-first analog: earliest event per (user, type) — the
    batch shape of dropDuplicates with a deterministic survivor."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id")
    )


SQL_SCAN_DEDUP_FIRST = """
SELECT user_id, event_type, min(event_id) AS first_event_id
FROM events GROUP BY user_id, event_type
"""


def q_scan_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: the whole eval_change pipeline (scanner.py:120-175) as
    one declarative plan over documents:

      F1 attribute filter (lang membership; filter_.py:43-47)
      -> F2 inclusive threshold on n_chars (editcount analog,
         filter_.py:88)
      -> F3 anti-join dedup against the pre-flagged set
         (filter_.py:90-102; here doc_id % 7 == 0 plays the flag log)
      -> F4 regex hits (filter_.py:110-112)
      -> P3 match message + content fingerprint.

    Cheap filters stay ahead of the regex scan structurally, matching
    the reference's manual cheap-before-expensive order
    (scanner.py:131-141).
    """
    d = _t(spark, sf_dir, "documents")
    spec = FilterSpec(
        name="flagship",
        streamfilter={"lang": ("en", "de")},
        max_edits=450,
        regexes=tuple(PATTERNS),
        log_level=2,
    )
    flagged = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("title")
    )
    base = spec.apply_attribute_filter(d).filter(
        spec.editcount_predicate(F.col("n_chars"))
    )
    base = base.withColumn("title", F.col("doc_id")).transform(
        lambda df: spec.apply_dedup(df, flagged)
    )
    # All-scalar form of hits/array_join/match_message: the hit list
    # only feeds derived strings here, so three boolean rlikes +
    # concat_ws (which skips the NULLs unmatched patterns leave behind)
    # produce byte-identical output to the array form while keeping the
    # whole projection codegen-small — the array form inlined ~5x by
    # CollapseProject put a ~1 s Janino compile on the first task (see
    # functions/regex.regex_matches docstring).
    uri = F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
    matches = regex_matches(F.col("text"), list(spec.regexes))
    n_hits = sum((m.cast("int") for _, m in matches), F.lit(0))
    hits_str = F.concat_ws(", ", *[F.when(m, F.lit(p)) for p, m in matches])
    quoted = F.concat_ws(", ", *[F.when(m, F.lit(f"`{p}`")) for p, m in matches])
    match_msg = F.concat(
        F.lit("***MATCH*** with regex"),
        F.when(n_hits > 1, F.lit("es ")).otherwise(F.lit(" ")),
        quoted,
        F.lit(": "),
        uri,
    )
    any_hit = matches[0][1]
    for _, m in matches[1:]:
        any_hit = any_hit | m
    return base.filter(any_hit).select(
        "doc_id",
        "lang",
        n_hits.cast("int").alias("n_hits"),
        hits_str.alias("hits_str"),
        match_msg.alias("match_msg"),
        fingerprint(F.col("text")).alias("fp"),
    )


SQL_SCAN_PIPELINE_FULL = f"""
WITH base AS (
  SELECT * FROM documents
  WHERE lang IN ('en', 'de')
    AND (450 IS NULL OR n_chars <= 450)
    AND NOT EXISTS (SELECT 1 FROM documents f
                    WHERE f.doc_id % 7 = 0 AND f.doc_id = documents.doc_id)
),
h AS (
  SELECT doc_id, lang, text,
         [p FOR p IN {_PATTERNS_SQL} IF regexp_matches(text, p)] AS hits
  FROM base
)
SELECT doc_id, lang,
       CAST(len(hits) AS INTEGER) AS n_hits,
       array_to_string(hits, ', ') AS hits_str,
       '***MATCH*** with regex' || CASE WHEN len(hits) > 1 THEN 'es ' ELSE ' ' END
       || array_to_string(['`' || h || '`' FOR h IN hits], ', ')
       || ': ' || 'doc://' || CAST(doc_id AS VARCHAR) AS match_msg,
       substring(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 16) AS fp
FROM h WHERE len(hits) > 0
"""


def q_scan_api_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 (filter_.py:57): server_name -> API URL derivation;
    ``documents.source`` plays the server_name."""
    from ..scanner import api_url

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", api_url(F.col("source")).alias("api"))


SQL_SCAN_API_ROUTE = """
SELECT doc_id, 'https://' || source || '/w/api.php?' AS api FROM documents
"""


QUERIES: dict[str, QuerySpec] = {
    "scan_api_route": QuerySpec(q_scan_api_route, SQL_SCAN_API_ROUTE),
    "scan_attribute_filter": QuerySpec(q_scan_attribute_filter, SQL_SCAN_ATTRIBUTE_FILTER),
    "scan_threshold_disabled": QuerySpec(
        q_scan_threshold_disabled, SQL_SCAN_THRESHOLD_DISABLED
    ),
    "scan_regex_hits": QuerySpec(q_scan_regex_hits, SQL_SCAN_REGEX_HITS),
    "scan_verb": QuerySpec(q_scan_verb, SQL_SCAN_VERB),
    "scan_message": QuerySpec(q_scan_message, SQL_SCAN_MESSAGE),
    "scan_match_message": QuerySpec(q_scan_match_message, SQL_SCAN_MATCH_MESSAGE),
    "scan_date_partition": QuerySpec(q_scan_date_partition, SQL_SCAN_DATE_PARTITION),
    "scan_filename": QuerySpec(q_scan_filename, SQL_SCAN_FILENAME),
    "scan_dedup_first": QuerySpec(q_scan_dedup_first, SQL_SCAN_DEDUP_FIRST),
    "scan_pipeline_full": QuerySpec(q_scan_pipeline_full, SQL_SCAN_PIPELINE_FULL),
}
