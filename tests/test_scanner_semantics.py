"""Semantics unit tests pinned to reference quirks (SURVEY.md §5.3):
NULL-disables threshold (filter_.py:88), inclusive <=, dedup by title
only (filter_.py:102), verb derivation (scanner.py:145), filename
sanitization (scanner.py:158), flag translation
(examples/filterlist.py:31), race-condition => skip (scanner.py:78-81).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from rc_scanner_spark.filters import ConfigError, FilterSpec
from rc_scanner_spark.functions.regex import (
    RegexDialectError,
    regex_hits,
    translate_pattern,
)
from rc_scanner_spark.scanner import scan
from rc_scanner_spark.schemas import CHANGE_SCHEMA

from tests.conftest import make_change


@pytest.fixture(scope="module")
def changes(spark):
    rows = [
        make_change(1, "Alpha"),
        make_change(2, "Alpha"),                       # duplicate title
        make_change(3, "User:Colon:Name", user="A:B"),  # sanitization
        make_change(4, "Beta", type_="create"),
        make_change(5, "Gamma", bot=True),              # filtered by bot
        make_change(6, "Delta", namespace=0),           # filtered by ns
        make_change(7, "Epsilon", user="NoCount"),      # missing user dim
        make_change(8, "Zeta", user="Busy"),            # over threshold
    ]
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


@pytest.fixture(scope="module")
def users(spark):
    return spark.createDataFrame(
        [("Alice", 5), ("A:B", 1), ("Busy", 1000)], "user string, editcount long"
    )


@pytest.fixture(scope="module")
def revisions(spark):
    # revid = 1000 + change id; 1007 intentionally missing (deleted page
    # race, scanner.py:193-196).
    rows = [(1000 + i, f"text with spark inside {i}") for i in (1, 2, 3, 4, 8)]
    return spark.createDataFrame(rows, "revid long, text string")


SPEC = dict(
    streamfilter={"type": ("edit", "create"), "bot": False, "namespace": 2},
    sites=("en.wikipedia.org",),
    regexes=("(?i)SPARK",),
    log_level=2,
)


def test_full_scan_pipeline(spark, changes, users, revisions):
    spec = FilterSpec(name="t", max_edits=10, **SPEC)
    out = scan(changes, spec, users=users, revisions=revisions).collect()
    titles = {r["title"] for r in out}
    # Alpha(1,2) pass; Colon passes; Beta passes; bot/ns filtered;
    # NoCount dropped (missing editcount = race skip); Busy over max.
    assert titles == {"Alpha", "User:Colon:Name", "Beta"}


def test_batch_dedup_only_suppresses_flagged_titles(spark, users):
    """Batch twin of the streaming test: a title whose FIRST event does
    not match must not suppress a later matching event for the same
    title (reference filter_.py:90-102 dedups against the flag log,
    which holds *matches* only).  A third matching event IS a true
    repeat and is dropped."""
    rows = [make_change(i + 1, "X") for i in range(3)]
    changes = spark.createDataFrame(rows, CHANGE_SCHEMA)
    revs = spark.createDataFrame(
        [(1001, "nothing here"), (1002, "all about spark"),
         (1003, "more spark stuff")],
        "revid long, text string",
    )
    spec = FilterSpec(name="t", max_edits=None, **SPEC)
    out = scan(changes, spec, users=users, revisions=revs).collect()
    assert len(out) == 1
    assert out[0]["title"] == "X"
    # the survivor is the FIRST matching revision, not the first event
    assert out[0]["revision"]["new"] == 1002


def test_batch_dedup_verbose_keeps_nonmatch_of_deduped_title(spark, users):
    """Verbose mode, both directions of the flag-log rule: a
    PRE-match non-matching event of a title passes through (the log
    holds matches only), but every POST-match event — matching or not
    — is suppressed (page_is_repeat returns before the verbose print,
    scanner.py:136-139)."""
    rows = [make_change(i + 1, "X") for i in range(4)]
    changes = spark.createDataFrame(rows, CHANGE_SCHEMA)
    revs = spark.createDataFrame(
        [(1001, "nothing here"), (1002, "all about spark"),
         (1003, "more spark stuff"), (1004, "nothing again")],
        "revid long, text string",
    )
    spec = FilterSpec(name="t", max_edits=None, **SPEC)
    out = scan(changes, spec, users=users, revisions=revs, verbose=True).collect()
    got = {(r["revision"]["new"], len(r["hits"])) for r in out}
    assert got == {(1001, 0), (1002, 1)}


def test_dedup_by_title_only(spark, changes, users, revisions):
    spec = FilterSpec(name="t", max_edits=None, **SPEC)
    flagged = spark.createDataFrame([("Alpha",)], "title string")
    out = scan(changes, spec, users=users, revisions=revisions, flagged=flagged)
    assert "Alpha" not in {r["title"] for r in out.collect()}


def test_threshold_null_disables(spark, changes, users, revisions):
    spec = FilterSpec(name="t", max_edits=None, **SPEC)
    out = scan(changes, spec, users=users, revisions=revisions).collect()
    assert "Zeta" in {r["title"] for r in out}  # Busy passes when disabled


def test_threshold_inclusive(spark):
    spec = FilterSpec(name="t", max_edits=5, log_level=0, skip_repeats=False)
    df = spark.range(1).select(F.lit(5).alias("ec"), F.lit(6).alias("ec6"))
    row = df.select(
        spec.editcount_predicate(F.col("ec")).alias("at"),
        spec.editcount_predicate(F.col("ec6")).alias("over"),
    ).first()
    assert row["at"] is True and row["over"] is False  # <= not <


def test_verb_and_filename_and_message(spark, changes, users, revisions):
    spec = FilterSpec(name="t", max_edits=None, **SPEC)
    rows = {r["title"]: r for r in scan(changes, spec, users=users, revisions=revisions).collect()}
    beta = rows["Beta"]
    assert beta["verb"] == "created"  # strip 'e' + 'ed' (scanner.py:145)
    colon = rows["User:Colon:Name"]
    assert colon["filename"] == "A-B_1003"  # ':' -> '-' (scanner.py:158)
    assert rows["Alpha"]["verb"] == "edited"
    assert rows["Alpha"]["message"].endswith('at 2026-08-13T00:00:00Z.')
    assert rows["Alpha"]["match_message"].startswith("***MATCH*** with regex `")
    assert rows["Alpha"]["date"] == "2026-08-13"


def test_config_error_on_invalid_combo():
    with pytest.raises(ConfigError):
        FilterSpec(name="bad", skip_repeats=True, log_level=1)
    with pytest.raises(ConfigError):
        FilterSpec(name="bad", log_level=7)


def test_regex_flag_translation():
    # compiled str patterns carry implicit re.UNICODE -> Java (?U)
    # (UNICODE_CHARACTER_CLASS), matching Python's Unicode \w/\b/case
    assert translate_pattern(re.compile("spark", re.I)) == "(?iU)spark"
    assert translate_pattern(re.compile("a.b", re.I | re.S)) == "(?isU)a.b"
    assert translate_pattern(r"\bword\b") == r"\bword\b"
    with pytest.raises(RegexDialectError):
        translate_pattern(r"(?P<name>x)")


def test_regex_hits_returns_matching_patterns(spark):
    df = spark.createDataFrame([("Spark and vectors here",)], "text string")
    hits = df.select(
        regex_hits(F.col("text"), ["(?i)spark", r"\bvector\b", "zzz"]).alias("h")
    ).first()["h"]
    # \bvector\b does not match 'vectors' -> only the (?i)spark hit
    assert hits == ["(?i)spark"]


def test_verbose_keeps_nonmatches(spark, changes, users, revisions):
    spec = FilterSpec(name="t", max_edits=None, **SPEC)
    out = scan(changes, spec, users=users, revisions=revisions, verbose=True)
    assert out.filter(F.size("hits") == 0).count() == 0  # all our texts match
    spec2 = FilterSpec(name="t", max_edits=None, streamfilter=SPEC["streamfilter"],
                       sites=SPEC["sites"], regexes=("nomatch_zzz",), log_level=2)
    out2 = scan(changes, spec2, users=users, revisions=revisions, verbose=True)
    assert out2.count() > 0  # verbose: rows survive with empty hits


def test_regex_end_anchor_dialect_mapping(spark):
    # Python \Z = absolute end-of-string = Java \z (Java's \Z stops
    # before a trailing newline, which would wrongly match here)
    assert translate_pattern(r"end\Z") == r"end\z"
    # literal backslash + Z stays untouched
    assert translate_pattern("end\\\\Z") == "end\\\\Z"
    with pytest.raises(RegexDialectError):
        translate_pattern(r"(?(1)a|b)")  # conditional group, Python-only
    df = spark.createDataFrame([("end\n",), ("end",)], "text string")
    hits = df.select(
        F.col("text"), regex_hits(F.col("text"), [r"end\Z"]).alias("h")
    ).collect()
    got = {r["text"]: r["h"] for r in hits}
    # Python semantics: re.search(r"end\Z", "end\n") is None
    assert got["end\n"] == []
    assert got["end"] == [r"end\z"]
