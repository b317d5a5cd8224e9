"""Planted-semantics tests for the round-6 warehouse7 batch
(per-group OLS, growth accounting, session paths, Wilson CI).

Hand-computed tiny fixtures — the oracle gate can't catch a semantic
flaw mirrored into the SQL twin, these can.
"""

from __future__ import annotations

import datetime
import math

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture


def test_stats_ols_group_planted(spark, tmp_path):
    # brand B1: exact line y = 2x + 1 through (0,1),(1,3),(2,5)
    # brand B2: zero x-variance -> all regression outputs NULL
    li = [
        (1, 0.00, 1.0), (1, 0.01, 3.0), (1, 0.02, 5.0),
        (2, 0.05, 7.0), (2, 0.05, 9.0),
    ]
    _write(
        spark, tmp_path, "lineitem",
        [(pk, d, q) for pk, d, q in li],
        "l_partkey long, l_discount double, l_quantity double",
    )
    _write(
        spark, tmp_path, "part",
        [(1, "B1"), (2, "B2")],
        "p_partkey long, p_brand string",
    )
    out = {
        r.p_brand: (r.n, r.slope_micro, r.intercept_milli, r.r2_ppm)
        for r in REG["stats_ols_group"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        "B1": (3, 2_000_000, 1_000, 1_000_000),
        "B2": (2, None, None, None),
    }


def test_events_growth_accounting_planted(spark, tmp_path):
    d = datetime.datetime
    # Monday-anchored weeks: 2020-01-06 is a Monday (wk W), 01-13 is
    # W+1, 01-20 is W+2.
    rows = [
        # u1 active W, W+1, W+2  -> new at W, retained W+1 and W+2
        (1, 1, d(2020, 1, 6)), (2, 1, d(2020, 1, 14)), (3, 1, d(2020, 1, 20)),
        # u2 active W, gap, W+2  -> new at W, churned at W+1,
        #                           resurrected at W+2
        (4, 2, d(2020, 1, 7)), (5, 2, d(2020, 1, 21)),
        # u3 active W only       -> new at W, churned at W+1
        (6, 3, d(2020, 1, 8)),
    ]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r.wk: (
            r.week_start, r.n_active, r.n_new, r.n_retained,
            r.n_resurrected, r.n_churned,
        )
        for r in REG["events_growth_accounting"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    wk0 = (datetime.date(2020, 1, 6) - datetime.date(1970, 1, 5)).days // 7
    assert out == {
        wk0: ("2020-01-06", 3, 3, 0, 0, 0),
        wk0 + 1: ("2020-01-13", 1, 0, 1, 0, 2),
        wk0 + 2: ("2020-01-20", 2, 0, 1, 1, 0),
    }


def test_events_top_paths_planted(spark, tmp_path):
    d = datetime.datetime
    rows = [
        # u1 session 1: a,b then a >30min gap starts session 2: c
        (1, 1, d(2020, 1, 1, 10, 0), "a"),
        (2, 1, d(2020, 1, 1, 10, 5), "b"),
        (3, 1, d(2020, 1, 1, 11, 0), "c"),
        # u2 one session: a,b (same path as u1's first)
        (4, 2, d(2020, 1, 1, 9, 0), "a"),
        (5, 2, d(2020, 1, 1, 9, 1), "b"),
        # u3: seven rapid events -> path truncates at 5 steps
        *[
            (10 + i, 3, d(2020, 1, 1, 12, i), t)
            for i, t in enumerate("abcdefg")
        ],
    ]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    out = {
        r.path: r.n_sessions
        for r in REG["events_top_paths"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {"a>b": 2, "c": 1, "a>b>c>d>e": 1}


def test_stats_wilson_ci_planted(spark, tmp_path):
    rows = [
        # source s: 3 of 4 docs pass (n_chars >= 300)
        (1, "s", 300), (2, "s", 400), (3, "s", 500), (4, "s", 10),
        # source t: 0 of 2 pass -> lo must clamp near 0, hi > 0
        (5, "t", 1), (6, "t", 2),
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, source string, n_chars long",
    )
    out = {
        r.source: (r.n, r.k, r.lo_ppm, r.hi_ppm)
        for r in REG["stats_wilson_ci"].fn(spark, str(tmp_path)).collect()
    }

    def wilson(k, n, plus):
        z = 1.96
        p = k / n
        num = (p + z * z / (2.0 * n)) + plus * z * math.sqrt(
            p * (1.0 - p) / n + z * z / (4.0 * n * n)
        )
        return math.floor(num / (1.0 + z * z / n) * 1e6)

    assert out == {
        "s": (4, 3, wilson(3, 4, -1), wilson(3, 4, 1)),
        "t": (2, 0, wilson(0, 2, -1), wilson(0, 2, 1)),
    }
    # sanity: the s interval actually brackets 750000 ppm
    assert out["s"][2] < 750000 < out["s"][3]


def test_events_growth_accounting_churn_only_week(spark, tmp_path):
    import datetime as _dt

    d = _dt.datetime
    # everyone active in week W, nobody in W+1, one user returns W+2:
    # the W+1 row must still appear carrying the churn count.
    rows = [
        (1, 1, d(2020, 1, 6)),
        (2, 2, d(2020, 1, 7)),
        (3, 1, d(2020, 1, 20)),
    ]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r.wk: (r.n_active, r.n_churned)
        for r in REG["events_growth_accounting"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    wk0 = (_dt.date(2020, 1, 6) - _dt.date(1970, 1, 5)).days // 7
    assert out == {
        wk0: (2, 0),
        wk0 + 1: (0, 2),   # churn-only week survives the join
        wk0 + 2: (1, 0),
    }
