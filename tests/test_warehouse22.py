"""Planted-semantics tests for round-7 batch 30."""

from __future__ import annotations

import datetime

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, event_type string"
)


def _ts(s):
    return datetime.datetime.fromtimestamp(s, datetime.timezone.utc).replace(
        tzinfo=None
    )


def test_join_asof_nearest_planted(spark, tmp_path):
    rows = [
        # user 1: clicks at -30 min and +20 min -> the FORWARD one wins
        (1, 1, _ts(36000), 0.0, "purchase"),   # 10:00
        (2, 1, _ts(34200), 0.0, "click"),      # 09:30
        (3, 1, _ts(37200), 0.0, "click"),      # 10:20
        # user 2: equidistant clicks (+-10 min) -> BACKWARD one wins
        (4, 2, _ts(36000), 0.0, "purchase"),
        (5, 2, _ts(35400), 0.0, "click"),      # 09:50
        (6, 2, _ts(36600), 0.0, "click"),      # 10:10
        # user 3: only a click 2 h away -> NULL match
        (7, 3, _ts(36000), 0.0, "purchase"),
        (8, 3, _ts(28800), 0.0, "click"),      # 08:00
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {r.event_id: (r.click_event_id, r.gap_us)
           for r in REG["join_asof_nearest"].fn(spark, str(tmp_path)).collect()}
    assert out == {
        1: (3, -1200 * 1000000),   # forward click, signed negative gap
        4: (5, 600 * 1000000),     # equidistant -> backward
        7: (None, None),
    }


def test_text_script_mix_planted(spark, tmp_path):
    rows = [
        (1, "ab1 你", "en", "A", 5),  # 2 latin, 1 digit, 1 space, 1 CJK
        (2, "??", "en", "B", 2),          # 2 other
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.source: (r.n_chars, r.latin_ppm, r.digit_ppm, r.space_ppm,
                   r.cjk_ppm, r.other_ppm)
        for r in REG["text_script_mix"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        "A": (5, 400000, 200000, 200000, 200000, 0),
        "B": (2, 0, 0, 0, 0, 1000000),
    }


def test_text_script_mix_degenerate_empty_source(spark, tmp_path):
    # review r7 convention: every statistic needs its zero-denominator
    # planted case.  A source with only empty/NULL text contributes
    # zero characters and must be EXCLUDED (not divide by zero / not
    # emit a NULL-share row) on the Spark side.
    rows = [
        (1, "", "en", "E", 0),
        (2, None, "en", "E", 0),
        (3, "ok", "en", "A", 2),
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {r.source for r in
           REG["text_script_mix"].fn(spark, str(tmp_path)).collect()}
    assert out == {"A"}


def test_events_bounce_rate_planted(spark, tmp_path):
    d = datetime.datetime
    rows = [
        # user 1: two events 10 min apart -> ONE session, not a bounce
        (1, 1, d(2026, 8, 1, 10, 0), 1.0, "view"),
        (2, 1, d(2026, 8, 1, 10, 10), 1.0, "click"),
        # user 2: single event on day 1 -> bounce
        (3, 2, d(2026, 8, 1, 12, 0), 1.0, "view"),
        # user 3: single event on day 2 -> bounce
        (4, 3, d(2026, 8, 2, 9, 0), 1.0, "view"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.day: (r.n_sessions, r.n_bounce, r.bounce_ppm)
        for r in REG["events_bounce_rate"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        "2026-08-01": (2, 1, 500000),
        "2026-08-02": (1, 1, 1000000),
    }
