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


def test_join_asof_nearest_matches_pandas_merge_asof(spark, tmp_path):
    """Reference-semantics check: the nearest-direction as-of join must
    reproduce pandas merge_asof(direction='nearest') — including its
    equidistant-resolves-backward tie rule — on a seeded random
    fixture (unique click timestamps per user so the secondary id
    tie-break never engages and the comparison is exact)."""
    import random

    import pandas as pd

    rng = random.Random(7)
    rows = []
    eid = 0
    for user in range(1, 21):
        seen = set()
        for _ in range(rng.randint(1, 12)):
            t = rng.randint(0, 50000)
            while t in seen:
                t = rng.randint(0, 50000)
            seen.add(t)
            eid += 1
            rows.append((eid, user, _ts(t), 0.0, "click"))
        for _ in range(rng.randint(1, 6)):
            t = rng.randint(0, 50000)
            while t in seen:  # keep purchase ts distinct from clicks:
                t = rng.randint(0, 50000)  # a 0-gap pair is trivially
            seen.add(t)  # nearest and exercises nothing
            eid += 1
            rows.append((eid, user, _ts(t), 0.0, "purchase"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r.event_id: r.click_event_id
        for r in REG["join_asof_nearest"].fn(spark, str(tmp_path)).collect()
    }

    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "value", "event_type"]
    )
    p = (
        pdf[pdf.event_type == "purchase"]
        .sort_values("ts")
        .reset_index(drop=True)
    )
    c = (
        pdf[pdf.event_type == "click"]
        .rename(columns={"event_id": "click_event_id", "ts": "click_ts"})
        .sort_values("click_ts")
        .reset_index(drop=True)
    )
    ref = pd.merge_asof(
        p,
        c[["user_id", "click_event_id", "click_ts"]],
        left_on="ts",
        right_on="click_ts",
        by="user_id",
        tolerance=pd.Timedelta(hours=1),
        direction="nearest",
    )
    expect = {
        int(r.event_id): (None if pd.isna(r.click_event_id)
                          else int(r.click_event_id))
        for r in ref.itertuples()
    }
    assert got == expect


def test_join_asof_tolerance_matches_pandas_merge_asof(spark, tmp_path):
    """Same reference check for the BACKWARD tolerance-bounded as-of
    (stats.py join_asof_tolerance) — pandas merge_asof(direction=
    'backward', tolerance=1h) is the authority."""
    import random

    import pandas as pd

    rng = random.Random(11)
    rows = []
    eid = 0
    for user in range(1, 21):
        seen = set()
        for kind, count in (("click", rng.randint(1, 12)),
                            ("purchase", rng.randint(1, 6))):
            for _ in range(count):
                t = rng.randint(0, 50000)
                while t in seen:
                    t = rng.randint(0, 50000)
                seen.add(t)
                eid += 1
                rows.append((eid, user, _ts(t), 0.0, kind))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r.event_id: r.click_event_id
        for r in REG["join_asof_tolerance"].fn(spark, str(tmp_path)).collect()
    }

    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "value", "event_type"]
    )
    p = (
        pdf[pdf.event_type == "purchase"]
        .sort_values("ts")
        .reset_index(drop=True)
    )
    c = (
        pdf[pdf.event_type == "click"]
        .rename(columns={"event_id": "click_event_id", "ts": "click_ts"})
        .sort_values("click_ts")
        .reset_index(drop=True)
    )
    ref = pd.merge_asof(
        p,
        c[["user_id", "click_event_id", "click_ts"]],
        left_on="ts",
        right_on="click_ts",
        by="user_id",
        tolerance=pd.Timedelta(hours=1),
        direction="backward",
    )
    expect = {
        int(r.event_id): (None if pd.isna(r.click_event_id)
                          else int(r.click_event_id))
        for r in ref.itertuples()
    }
    assert got == expect


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
