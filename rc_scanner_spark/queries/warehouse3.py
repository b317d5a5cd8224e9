"""Round-6 warehouse / pipeline additions: interval-overlap self-join,
interval union (covered time), deterministic mode, Bloom-pruned join,
salted two-phase aggregation, per-group reservoir sampling, time-range
rolling windows, and RAKE-style keyphrase extraction.

Why these belong in a 100 TB training-data engine: interval joins and
interval unions are the session/occupancy primitives of event
analytics; the Bloom-pruned join and salted two-phase aggregate are
the two standard shuffle-volume mitigations (semi-join reduction and
hot-key splitting) demonstrated as result-identical rewrites of their
naive forms; per-group reservoir sampling builds eval sets with a
fixed per-stratum budget; and keyphrase extraction is the phrase-level
upgrade of the tf-idf unigram signal for corpus topic profiling.

Shared scale discipline (per-query notes on each builder):
  * every self-join carries an equi key (custkey / grid bucket) so the
    non-equi part is a residual predicate, never a cartesian;
  * money through integer cents, durations through integer seconds —
    no float summation-order divergence at any scale;
  * windows are always partitioned (user / doc / lang) — no global
    windows;
  * the Bloom build is a 1-row aggregate broadcast to the fact side
    (pinned in tests/test_plan_audit.py ALLOWED_CARTESIANS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load_tuned

_t = load_tuned


# --------------------------------------------------------------------
# interval-overlap self-join
# --------------------------------------------------------------------


def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of orders from the SAME
    customer whose service intervals overlap.  Interval =
    [o_orderdate, o_orderdate + floor(o_totalprice/1000)+1 days]
    (pricier orders take longer to fulfil).

    Scale: the join carries the o_custkey equi key, so Spark plans a
    hash/sort-merge join shuffled on custkey and evaluates the
    interval predicate as a residual — per-customer order counts are
    bounded, so the pair fan-out is bounded per key and never global.
    An interval join WITHOUT an equi key must grid-bucket first (see
    events_concurrency's minute grid for that pattern)."""
    o = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderdate").cast("date").alias("start"),
            F.date_add(
                F.col("o_orderdate").cast("date"),
                (F.floor(F.col("o_totalprice") / 1000) + 1).cast("int"),
            ).alias("end"),
        )
    )
    a = o.alias("a")
    b = o.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.okey") < F.col("b.okey"))
            & (F.col("a.start") <= F.col("b.end"))
            & (F.col("b.start") <= F.col("a.end")),
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.okey").alias("key_a"),
            F.col("b.okey").alias("key_b"),
            (
                F.datediff(
                    F.least(F.col("a.end"), F.col("b.end")),
                    F.greatest(F.col("a.start"), F.col("b.start")),
                )
                + 1
            )
            .cast("long")
            .alias("overlap_days"),
        )
    )


SQL_JOIN_INTERVAL_OVERLAP = """
WITH o AS (
  SELECT o_custkey, o_orderkey AS okey,
         CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE)
           + CAST(floor(o_totalprice / 1000) + 1 AS INT) AS e
  FROM orders
)
SELECT a.o_custkey AS custkey, a.okey AS key_a, b.okey AS key_b,
       CAST(date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1 AS BIGINT)
           AS overlap_days
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.okey < b.okey
 AND a.s <= b.e AND b.s <= a.e
"""


# --------------------------------------------------------------------
# interval union (covered time per user)
# --------------------------------------------------------------------


def q_events_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total covered time per user after merging overlapping activity
    intervals [ts, ts + floor(value*60) seconds] — the classic
    interval-union sweep, as two partitioned windows:

      1. per user in start order, running max of preceding ends;
         a row whose start exceeds it opens a new island;
      2. islands aggregate to (min start, max end); covered time =
         sum of island extents.

    Scale: both windows partition by user_id — per-user event counts
    bound every frame; no global ordering anywhere.  All arithmetic
    in integer epoch seconds (no float, no timezone)."""
    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("start_s"),
        (F.col("ts").cast("long") + F.floor(F.col("value") * 60).cast("long")).alias(
            "end_s"
        ),
    )
    w = Window.partitionBy("user_id").orderBy("start_s", "event_id")
    prev_max_end = F.max("end_s").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        F.when(
            prev_max_end.isNull() | (F.col("start_s") > prev_max_end), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        F.min("start_s").alias("s"), F.max("end_s").alias("e")
    )
    return per_island.groupBy("user_id").agg(
        F.sum(F.col("e") - F.col("s")).alias("covered_s"),
        F.count(F.lit(1)).alias("n_islands"),
    )


SQL_EVENTS_INTERVAL_UNION = """
WITH iv AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
         CAST(floor(epoch(ts)) AS BIGINT)
           + CAST(floor(value * 60) AS BIGINT) AS end_s
  FROM events
),
flagged AS (
  SELECT *,
         CASE WHEN max(end_s) OVER (
                 PARTITION BY user_id ORDER BY start_s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              IS NULL
           OR start_s > max(end_s) OVER (
                 PARTITION BY user_id ORDER BY start_s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT *, sum(new_island) OVER (
            PARTITION BY user_id ORDER BY start_s, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
per_island AS (
  SELECT user_id, island, min(start_s) AS s, max(end_s) AS e
  FROM islands GROUP BY user_id, island
)
SELECT user_id, CAST(sum(e - s) AS BIGINT) AS covered_s,
       count(*) AS n_islands
FROM per_island GROUP BY user_id
"""


# --------------------------------------------------------------------
# deterministic mode aggregate
# --------------------------------------------------------------------


def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: each user's most frequent event
    type, ties broken toward the lexicographically LARGEST type (both
    engines compare structs field-by-field, so max(struct(cnt, type))
    is the same deterministic winner everywhere — never the
    "arbitrary row" semantics of SQL mode()).

    Scale: two hash aggregations — (user, type) partial counts, then
    a per-user struct max; both map-side combinable, one shuffle
    each on bounded keys."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    best = F.max(F.struct(F.col("cnt"), F.col("event_type").alias("t")))
    return counts.groupBy("user_id").agg(
        best.getField("t").alias("mode_type"),
        best.getField("cnt").alias("mode_cnt"),
    )


SQL_AGG_MODE = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       max({'cnt': cnt, 't': event_type}).t AS mode_type,
       max({'cnt': cnt, 't': event_type}).cnt AS mode_cnt
FROM counts GROUP BY user_id
"""


# --------------------------------------------------------------------
# Bloom-pruned join
# --------------------------------------------------------------------

_BLOOM_WORDS = 16  # 1024 bits
_BLOOM_K = 3


def _bloom_positions(key):
    """k hash bit positions for a key: pmod(xxhash64(key, seed), m)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(_BLOOM_WORDS * 64))
        for i in range(_BLOOM_K)
    ]


def q_join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned dimension join: revenue per brand for large parts
    (p_size >= 46).  The fact side (lineitem) is pre-filtered by a
    1024-bit / 3-hash Bloom filter built from the surviving dimension
    keys BEFORE the join — the manual form of Spark's runtime
    bloom-filter join reduction, written out so the mechanism is
    visible and testable.

    Result-identical to the plain join (the Bloom only has false
    POSITIVES, and the exact join removes those), so the oracle is
    the naive SQL join.  Scale: at 100 TB the win is shuffle volume —
    rows that cannot match never leave the map side (~selectivity of
    the dim filter, here ~10%), at the cost of one broadcast of 128
    bytes of filter state.  The Bloom build is a 1-row aggregate
    (bit_or of per-key masks) cross-joined broadcast onto the fact —
    the benign broadcast-scalar cartesian pattern."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 46)
        .select("p_partkey", "p_brand")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    # build: one row of m/64 longs, each the bit_or of the masks that
    # land in that word
    word_cols = []
    positions = _bloom_positions(F.col("p_partkey"))
    for w in range(_BLOOM_WORDS):
        mask = F.lit(0).cast("long")
        for pos in positions:
            shifted = F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
            )
            mask = mask.bitwiseOR(
                F.when((pos / 64).cast("int") == w, shifted).otherwise(
                    F.lit(0).cast("long")
                )
            )
        word_cols.append(F.bit_or(mask).alias(f"w{w}"))
    bloom = p.agg(*word_cols).select(
        F.array(*[F.col(f"w{w}") for w in range(_BLOOM_WORDS)]).alias("bloom")
    )
    # probe: all k bits set -> candidate
    probe_positions = _bloom_positions(F.col("l_partkey"))
    cond = F.lit(True)
    for pos in probe_positions:
        word = F.element_at(F.col("bloom"), (pos / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    candidates = li.crossJoin(F.broadcast(bloom)).filter(cond).drop("bloom")
    joined = candidates.join(p, candidates.l_partkey == p.p_partkey)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
            ).cast("long")
        ).alias("revenue_cents"),
    )


SQL_JOIN_BLOOM_PRUNED = """
SELECT p_brand, count(*) AS n_items,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size >= 46
GROUP BY p_brand
"""


# --------------------------------------------------------------------
# salted two-phase aggregation
# --------------------------------------------------------------------


def q_agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: per-event-type totals computed as
    groupBy(type, salt) partials -> groupBy(type) final.  The manual
    form of hot-GROUP-BY-key mitigation: one pathological key (90% of
    a 100 TB stream being 'click') overwhelms a single reducer in the
    naive plan; with a 16-way deterministic salt the key's partials
    spread across 16 tasks and the final pass merges 16 rows.

    Salt = pmod(xxhash64(event_id), 16): DETERMINISTIC (retry-safe,
    unlike a random salt — see salted_join's docstring for the stage
    retry hazard).  Sums in integer cents, so the two-phase
    re-association is exact — float sums would differ by summation
    order between the phases and the oracle."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    partial = (
        ev.select(
            "event_type",
            F.pmod(F.xxhash64("event_id"), F.lit(16)).alias("salt"),
            cents.alias("cents"),
        )
        .groupBy("event_type", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("cents").alias("psum"))
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("psum").alias("value_cents"),
    )


SQL_AGG_SALTED_TWOPHASE = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_cents
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------
# per-group reservoir sample
# --------------------------------------------------------------------


def q_sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group reservoir: exactly k=5 documents per
    language, chosen by a salted portable hash (md5-derived, replayable
    in any engine) — the fixed-budget-per-stratum eval-set builder
    (contrast sample_uniform_k: one global budget; sample_stratified:
    proportional rates).

    Scale: one partitioned window per language (row_number over hash
    order) — never a global sort; the hash order makes re-runs stable
    under repartitioning and cluster size changes."""
    d = _t(spark, sf_dir, "documents")
    hv = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|res42"))), 1, 15),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("lang").orderBy(hv.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", F.col("rk").cast("long").alias("rk"), "doc_id", "source")
    )


SQL_SAMPLE_RESERVOIR_GROUP = """
WITH h AS (
  SELECT lang, doc_id, source,
         CAST(concat('0x', substr(md5(doc_id || '|res42'), 1, 15)) AS BIGINT)
             AS hv
  FROM documents
),
r AS (
  SELECT lang, doc_id, source,
         row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
  FROM h
)
SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, source
FROM r WHERE rk <= 5
"""


# --------------------------------------------------------------------
# time-range rolling window
# --------------------------------------------------------------------


def q_window_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 1-hour activity: for every event, the count
    and value sum of the same user's events in the preceding hour
    (inclusive) — a RANGE frame over time, the shape RANGE BETWEEN
    INTERVAL '1' HOUR PRECEDING expresses in SQL.

    Implementation: rangeBetween(-3600, 0) over integer epoch seconds
    (the DataFrame API's numeric-range form of the interval frame;
    peers at the same second share a frame in both engines by
    construction).  Partitioned by user — bounded frames, no global
    window.  Sums in integer cents."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_s"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s").rangeBetween(-3600, 0)
    return base.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum("cents").over(w).alias("cents_1h"),
    )


SQL_WINDOW_TIME_RANGE_ROLLING = """
WITH base AS (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
       count(*) OVER (PARTITION BY user_id ORDER BY ts_s
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_1h,
       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts_s
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cents_1h
FROM base
"""


# --------------------------------------------------------------------
# RAKE-style keyphrase extraction
# --------------------------------------------------------------------

_RAKE_STOPWORDS = (
    "the", "a", "of", "and", "to", "in", "is", "for", "on", "with",
    "as", "by", "an", "at", "it", "or", "be", "are", "was", "that",
)


def q_text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE-style keyphrase extraction: candidate phrases are maximal
    runs of non-stopword tokens; the corpus-level score of a phrase is
    its document frequency; output = top 15 multi-word phrases per
    language (deterministic tie-break: phrase ascending).

    Scale: tokenize once (the words() split), posexplode to
    (doc, pos, word), detect phrase islands with ONE window
    partitioned by doc (running count of stopword boundaries), then
    hash-aggregate phrases.  Phrase cardinality is corpus-sized, not
    quadratic; the per-language top-k is a partitioned window over the
    phrase aggregate."""
    from ..operators.text import words

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.posexplode(words(F.col("text"))).alias("pos", "word")
    )
    is_stop = F.col("word").isin(*_RAKE_STOPWORDS)
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    grouped = toks.withColumn(
        "grp",
        F.sum(is_stop.cast("int")).over(
            wdoc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).filter(~is_stop)
    phrases = (
        grouped.groupBy("doc_id", "lang", "grp")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("pos", "word"))
                ).getField("word"),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .filter(F.col("n_words") >= 2)
    )
    scored = phrases.groupBy("lang", "phrase").agg(
        F.count_distinct("doc_id").alias("df")
    )
    wtop = Window.partitionBy("lang").orderBy(
        F.col("df").desc(), F.col("phrase").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= 15)
        .select("lang", F.col("rk").cast("long").alias("rk"), "phrase", "df")
    )


SQL_TEXT_RAKE_KEYWORDS = """
WITH arrs AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                     x -> x <> '') AS ws
  FROM documents
),
toks AS (
  SELECT doc_id, lang, unnest(ws) AS word,
         CAST(generate_subscripts(ws, 1) AS BIGINT) - 1 AS pos
  FROM arrs
),
flagged AS (
  SELECT *,
         CASE WHEN word IN ('the','a','of','and','to','in','is','for','on',
                            'with','as','by','an','at','it','or','be','are',
                            'was','that') THEN 1 ELSE 0 END AS is_stop
  FROM toks
),
grouped AS (
  SELECT *, sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM flagged
),
phrases AS (
  SELECT doc_id, lang, grp,
         string_agg(word, ' ' ORDER BY pos) AS phrase,
         count(*) AS n_words
  FROM grouped WHERE is_stop = 0
  GROUP BY doc_id, lang, grp
  HAVING count(*) >= 2
),
scored AS (
  SELECT lang, phrase, count(DISTINCT doc_id) AS df
  FROM phrases GROUP BY lang, phrase
),
ranked AS (
  SELECT lang, phrase, df,
         row_number() OVER (PARTITION BY lang ORDER BY df DESC, phrase) AS rk
  FROM scored
)
SELECT lang, CAST(rk AS BIGINT) AS rk, phrase, CAST(df AS BIGINT) AS df
FROM ranked WHERE rk <= 15
"""


QUERIES: dict[str, QuerySpec] = {
    "join_interval_overlap": QuerySpec(
        q_join_interval_overlap, SQL_JOIN_INTERVAL_OVERLAP
    ),
    "events_interval_union": QuerySpec(
        q_events_interval_union, SQL_EVENTS_INTERVAL_UNION
    ),
    "agg_mode": QuerySpec(q_agg_mode, SQL_AGG_MODE),
    "join_bloom_pruned": QuerySpec(q_join_bloom_pruned, SQL_JOIN_BLOOM_PRUNED),
    "agg_salted_twophase": QuerySpec(
        q_agg_salted_twophase, SQL_AGG_SALTED_TWOPHASE
    ),
    "sample_reservoir_group": QuerySpec(
        q_sample_reservoir_group, SQL_SAMPLE_RESERVOIR_GROUP
    ),
    "window_time_range_rolling": QuerySpec(
        q_window_time_range_rolling, SQL_WINDOW_TIME_RANGE_ROLLING
    ),
    "text_rake_keywords": QuerySpec(q_text_rake_keywords, SQL_TEXT_RAKE_KEYWORDS),
}
