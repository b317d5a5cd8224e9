"""The scanner pipeline, Spark-first.

Reference: ``eval_change`` (scanner.py:120-175) — a hand-coded
per-event physical plan with a fixed operator order:

    F1 attribute filter (in-stream)
    -> S3 editcount lookup + F2 threshold (cheap; early return,
       scanner.py:131-135)
    -> F3 dedup against the flag log (early return, scanner.py:136-139)
    -> S2 wikitext fetch (expensive, scanner.py:141)
    -> F4 regex search (scanner.py:142)
    -> P1-P5 projections + K1-K4 sinks

Spark mapping: one DataFrame expression chain.  The cheap filters stay
*before* the text join structurally — Catalyst does not cost custom
enrichment, so the ordering the reference encodes by early-returns is
encoded here by building the plan in stages (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .filters import FilterSpec


def verb_column(type_col: Column) -> Column:
    """P1 (scanner.py:145): past-tense verb — strip trailing 'e', add
    'ed' (edit->edited, create->created)."""
    return F.concat(F.regexp_replace(type_col, "e$", ""), F.lit("ed"))


def event_message(user: Column, verb: Column, title: Column, dt: Column) -> Column:
    """P2 (scanner.py:144-146): '{user} {verb} "{title}" at {dt}.'"""
    return F.format_string('%s %s "%s" at %s.', user, verb, title, dt)


def match_message(hits: Column, uri: Column) -> Column:
    """P3 (scanner.py:148-151): '***MATCH*** with regex(es) `p`, ...: uri'
    with pluralization on len(hits) > 1 and backtick-quoted patterns."""
    return F.concat(
        F.lit("***MATCH*** with regex"),
        F.when(F.size(hits) > 1, F.lit("es ")).otherwise(F.lit(" ")),
        F.array_join(
            F.transform(hits, lambda h: F.concat(F.lit("`"), h, F.lit("`"))),
            ", ",
        ),
        F.lit(": "),
        uri,
    )


def date_partition(dt: Column) -> Column:
    """P4 (scanner.py:155): meta.dt[:10] -> YYYY-MM-DD partition key."""
    return F.substring(dt, 1, 10)


def api_url(server_name: Column) -> Column:
    """S4 (filter_.py:57, scanner.py:128): server_name -> MediaWiki API
    URL.  The reference pre-builds a dict per site; as a column
    derivation the "dict" is just string concat — constant-folded and
    codegen'd, no lookup table needed."""
    return F.concat(F.lit("https://"), server_name, F.lit("/w/api.php?"))


def sanitize_filename(user: Column, revid: Column) -> Column:
    """P5 (scanner.py:156-158): '{user}_{revid}' with ':' -> '-'
    (colons invalid in filenames)."""
    return F.translate(F.concat_ws("_", user, revid.cast("string")), ":", "-")


def scan(
    changes: DataFrame,
    spec: FilterSpec,
    users: DataFrame | None = None,
    revisions: DataFrame | None = None,
    flagged: DataFrame | None = None,
    verbose: bool = False,
) -> DataFrame:
    """Batch twin of the reference's event loop (scanner.py:75-81).

    Parameters mirror the reference's external dependencies as
    dimension tables: ``users(user, editcount)`` replaces
    get_editcount (scanner.py:199-218), ``revisions(revid, text)``
    replaces get_text (scanner.py:178-196), ``flagged(title, ...)`` is
    the flag-log state the dedup reads (filter_.py:102).

    Returns the flagged-changes DataFrame (one row per match) with the
    P1-P5 projection columns.  ``verbose`` keeps non-matching rows
    (hits empty), mirroring -v console output (scanner.py:132-139).
    """
    # F1 — pushed into the scan by Catalyst.
    df = spec.apply_attribute_filter(changes)

    # S3 + F2 — broadcast join against the small users dim, then the
    # NULL-disables threshold.  A missing user yields NULL editcount:
    # the reference treats a failed lookup as QueryRaceCondition and
    # skips the event (scanner.py:215-218, 78-81) -> filter it out,
    # unless the threshold itself is disabled (then editcount is never
    # consulted; the reference still fetches it, we don't need to).
    if spec.max_edits is not None and users is None:
        # Silently flagging every over-threshold user would diverge
        # from the reference (which always consults editcount when a
        # threshold is set) — make the missing dimension an error.
        raise ValueError(
            f"filter {spec.name!r} sets max_edits={spec.max_edits} "
            "but no users dimension was provided"
        )
    if users is not None:
        df = df.join(F.broadcast(users), on="user", how="left")
        if spec.max_edits is not None:
            df = df.filter(
                F.col("editcount").isNotNull()
                & spec.editcount_predicate(F.col("editcount"))
            )

    # F3a — anti-join against the pre-existing flag log (cheap, stays
    # ahead of the expensive text join; filter_.py:90-102).  The
    # within-batch keep-first (F3b) intentionally runs AFTER the F4
    # match, over matched rows only — the flag log records matches, so
    # a title's non-matching first event must not suppress its later
    # genuine match (mirrors streaming/pipeline.py dedup-after-match).
    df = spec.apply_flagged_anti_join(df, flagged)

    # S2 — the expensive enrichment, structurally after the cheap
    # filters (scanner.py:131-141 ordering).  Left join + race filter:
    # a deleted revision (missing text) is a skip, not a failure
    # (scanner.py:193-196, C1).
    if revisions is not None:
        df = df.join(
            revisions,
            on=df["revision.new"] == revisions["revid"],
            how="left",
        ).drop("revid")
        df = df.filter(F.col("text").isNotNull())
    else:
        # No revisions dimension = every text fetch "fails": per C1
        # every event is a race skip, same as a missing revision row.
        # Attaching NULL text (then the isNotNull filter) keeps the
        # plan valid instead of crashing on an unresolved column.
        df = df.withColumn("text", F.lit(None).cast("string"))
        df = df.filter(F.col("text").isNotNull())

    # F4 — regex hits, then F3b within-batch keep-first over MATCHES
    # in stream order (keeps all non-matching rows for verbose mode).
    df = df.withColumn("hits", spec.hits(F.col("text")))
    # revision.new is a final deterministic tiebreaker: two events of
    # one title can share (timestamp, meta.id) in replayed/merged
    # feeds, and without a total order the keep-first window could
    # flip which tied row survives between runs (filters.py
    # apply_match_keep_first docstring).
    df = spec.apply_match_keep_first(
        df,
        F.size("hits") > 0,
        order_cols=("timestamp", "meta.id", "revision.new"),
    )
    if not verbose:
        df = df.filter(F.size("hits") > 0)

    # P1-P5 projections.
    verb = verb_column(F.col("type"))
    return (
        df.withColumn("verb", verb)
        .withColumn(
            "message", event_message(F.col("user"), verb, F.col("title"), F.col("meta.dt"))
        )
        .withColumn("match_message", match_message(F.col("hits"), F.col("meta.uri")))
        .withColumn("date", date_partition(F.col("meta.dt")))
        .withColumn(
            "filename", sanitize_filename(F.col("user"), F.col("revision.new"))
        )
        .withColumn("filter", F.lit(spec.name))
    )
