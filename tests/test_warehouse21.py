"""Planted-semantics tests for round-7 batch 29."""

from __future__ import annotations

import datetime
import math

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, event_type string"
)


def test_profile_quality_dup_calibration_planted(spark, tmp_path):
    # "the and of to a": 5 words, all stopwords, no punct ->
    # quality = min(5/50,1)*0.4 + 1.0*0.4 + 0*0.2 = 0.44 -> band 8;
    # the two copies share a fingerprint -> dup.
    # "zz yy xx": 3 words, 0 stopwords -> quality 0.024 -> band 0, unique.
    rows = [
        (1, "the and of to a", "en", "A", 15),
        (2, "the and of to a", "en", "B", 15),
        (3, "zz yy xx", "en", "A", 8),
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.band: (r.n_docs, r.n_dup, r.dup_ppm)
        for r in REG["profile_quality_dup_calibration"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {8: (2, 2, 1000000), 0: (1, 0, 0)}


def test_events_error_pchart_planted(spark, tmp_path):
    d = datetime.datetime
    rows = []
    eid = 0
    for _ in range(10):  # day 1: all errors
        eid += 1
        rows.append((eid, 1, d(2026, 8, 1), 1.0, "error"))
    for _ in range(10):  # day 2: no errors
        eid += 1
        rows.append((eid, 1, d(2026, 8, 2), 1.0, "view"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.day: (r.n_events, r.n_errors, r.p_ppm, r.ucl_ppm, r.lcl_ppm,
                r.out_of_control)
        for r in REG["events_error_pchart"].fn(spark, str(tmp_path)).collect()
    }
    pbar = 10 / 20
    sigma = math.sqrt(pbar * (1 - pbar) / 10)
    ucl = math.floor((pbar + 3 * sigma) * 1e6 + 0.5)
    lcl = math.floor(max(pbar - 3 * sigma, 0.0) * 1e6 + 0.5)
    # day 1 sits ABOVE the upper limit, day 2 BELOW the lower limit
    assert out == {
        "2026-08-01": (10, 10, 1000000, ucl, lcl, 1),
        "2026-08-02": (10, 0, 0, ucl, lcl, 1),
    }
    assert lcl > 0  # the lower limit genuinely binds in this fixture


def test_events_error_pchart_thin_day_widens(spark, tmp_path):
    # same error share on a thin day must NOT alarm while the fat day
    # with the same share defines the center: 1/2 errors on day 1
    # (n=2), 50/100 on day 2 -> pbar=0.5; day-1 sigma is ~7x wider.
    d = datetime.datetime
    rows = []
    eid = 0
    for i in range(2):
        eid += 1
        rows.append((eid, 1, d(2026, 8, 1), 1.0,
                     "error" if i < 1 else "view"))
    for i in range(100):
        eid += 1
        rows.append((eid, 1, d(2026, 8, 2), 1.0,
                     "error" if i < 50 else "view"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.day: (r.out_of_control, r.ucl_ppm)
        for r in REG["events_error_pchart"].fn(spark, str(tmp_path)).collect()
    }
    assert out["2026-08-01"][0] == 0 and out["2026-08-02"][0] == 0
    # thin-day limit is wider than the fat-day limit
    assert out["2026-08-01"][1] > out["2026-08-02"][1]
