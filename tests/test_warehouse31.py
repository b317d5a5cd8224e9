"""Planted-semantics tests for round-11 batch 47 (SPRT + TOST)."""

from __future__ import annotations

import datetime
import hashlib
import math

from rc_scanner_spark.queries import build_registry
from rc_scanner_spark.queries.warehouse31 import (
    _SPRT_A,
    _SPRT_B,
    _SPRT_C1,
    _SPRT_C2,
    _TOST_MARGIN,
)

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture

EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, event_type string"
)


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour)


def _bucket(uid: int) -> int:
    h = hashlib.md5(f"{uid}|exp1".encode()).hexdigest()
    return int(h[:15], 16) % 1000


def _uid(arm: str, start: int = 1) -> int:
    uid = start
    while True:
        b = _bucket(uid)
        if (arm == "c") == (b < 500):
            return uid
        uid += 1


# --------------------------------------------------------------------
# SPRT
# --------------------------------------------------------------------


def test_sprt_accepts_h1_on_high_conversion(spark, tmp_path):
    # 10 purchases/day, no other events: llr(day d) = 10*d*c1.
    # c1 = ln(1.25) ~ 0.2231; the ln(19) ~ 2.944 boundary crosses on
    # day 2 (llr 4.46).  Day 1 must still read 'continue'.
    rows = []
    eid = 0
    for d in (1, 2, 3):
        for i in range(10):
            eid += 1
            rows.append((eid, 1, _ts(d, i % 24), 1.0, "purchase"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {r.day: r for r in REG["stats_sprt_conversion"].fn(spark, str(tmp_path)).collect()}
    d1, d2 = got["2024-01-01"], got["2024-01-02"]
    assert (d1.n_cum, d1.k_cum) == (10, 10)
    assert d1.llr_milli == math.floor(10 * _SPRT_C1 * 1000 + 0.5)
    assert d1.decision == "continue"
    assert d2.decision == "accept_h1"
    assert got["2024-01-03"].decision == "accept_h1"


def test_sprt_accepts_h0_on_zero_conversion(spark, tmp_path):
    # 25 non-purchases/day: llr(day d) = 25*d*c2, c2 = ln(0.9375)
    # ~ -0.0645; the -2.944 boundary crosses at n >= 46 -> day 2.
    rows = []
    eid = 0
    for d in (1, 2):
        for i in range(25):
            eid += 1
            rows.append((eid, 1, _ts(d, i % 24), 1.0, "click"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {r.day: r for r in REG["stats_sprt_conversion"].fn(spark, str(tmp_path)).collect()}
    assert got["2024-01-01"].decision == "continue"
    assert got["2024-01-02"].decision == "accept_h0"
    assert got["2024-01-02"].llr_milli == math.floor(50 * _SPRT_C2 * 1000 + 0.5)
    assert _SPRT_A > 0 > _SPRT_B  # boundary sanity


# --------------------------------------------------------------------
# TOST
# --------------------------------------------------------------------


def _arm_rows(uid: int, values, start_eid: int):
    rows = []
    eid = start_eid
    for v in values:
        eid += 1
        rows.append((eid, uid, _ts(1 + eid % 20, eid % 24), v, "click"))
    return rows, eid


def test_tost_claims_equivalence_on_identical_tight_arms(spark, tmp_path):
    # Both arms ~N(5, tiny): diff ~ 0 << margin, se tiny -> z_lo >> 0,
    # z_hi << 0 -> both one-sided p's ~ 0 -> equivalent.
    uc, ut = _uid("c"), _uid("t")
    vals = [5.0 + 0.01 * (i % 5) for i in range(200)]
    rows, eid = _arm_rows(uc, vals, 0)
    more, _ = _arm_rows(ut, vals, eid)
    _write(spark, tmp_path, "events", rows + more, EV_SCHEMA)
    [r] = REG["stats_tost_equivalence"].fn(spark, str(tmp_path)).collect()
    assert r.n_control == 200 and r.n_treatment == 200
    assert abs(r.diff_milli) < 50
    assert r.equivalent is True
    assert r.p_tost_ppm < 50_000  # p well under alpha


def test_tost_rejects_equivalence_on_large_shift(spark, tmp_path):
    # Arms differ by 1.0 >> margin 0.1: z_hi is large POSITIVE, its
    # lower-tail p ~ 1 -> p_tost ~ 1 -> not equivalent.
    uc, ut = _uid("c"), _uid("t")
    rows, eid = _arm_rows(uc, [6.0 + 0.01 * (i % 5) for i in range(100)], 0)
    more, _ = _arm_rows(ut, [5.0 + 0.01 * (i % 5) for i in range(100)], eid)
    _write(spark, tmp_path, "events", rows + more, EV_SCHEMA)
    [r] = REG["stats_tost_equivalence"].fn(spark, str(tmp_path)).collect()
    assert abs(r.diff_milli - 1000) < 50
    assert r.equivalent is False
    assert r.p_tost_ppm > 500_000
    assert _TOST_MARGIN == 0.10


def test_tost_degenerate_arm_yields_nulls(spark, tmp_path):
    # Treatment arm has a single event -> its variance is undefined ->
    # NULL p and NULL verdict (never a throw) on the Spark side.
    uc, ut = _uid("c"), _uid("t")
    rows, eid = _arm_rows(uc, [5.0, 5.1, 5.2, 5.3], 0)
    more, _ = _arm_rows(ut, [5.0], eid)
    _write(spark, tmp_path, "events", rows + more, EV_SCHEMA)
    [r] = REG["stats_tost_equivalence"].fn(spark, str(tmp_path)).collect()
    assert r.p_tost_ppm is None and r.equivalent is None
