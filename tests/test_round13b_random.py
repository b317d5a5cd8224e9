"""Randomized independent-implementation replays for the round-13
batch-52 operators (slow certification lane): every draw builds a
random fixture, runs the registry query, and checks EXACT equality
against a pure-Python mirror.
"""

from __future__ import annotations

import datetime
import math
import random

import pytest

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture
from tests.test_round13b import (
    DOC_SCHEMA,
    EV_SCHEMA,
    ORD_SCHEMA,
    _bitemporal_mirror,
    _daynum,
    _haar_mirror,
    _markov_mirror,
    _median_x2,
    _pps_mirror,
    _ts,
    _us,
)

pytestmark = pytest.mark.slow  # certification lane (pytest.ini)

REG = build_registry()

_US_PER_DAY = 86_400_000_000


# ---- join_bitemporal_asof ---------------------------------------------------


@pytest.mark.parametrize("seed", [1351, 1352, 1353])
def test_bitemporal_asof_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, eid = [], 0
    for uid in range(1, rng.randint(4, 9)):
        for _ in range(rng.randint(0, 6)):
            eid += 1
            rows.append(
                (
                    eid,
                    uid,
                    _ts(rng.randint(1, 20), rng.randint(0, 23), rng.randint(0, 59)),
                    rng.uniform(1, 500),
                    "purchase",
                )
            )
        for _ in range(rng.randint(1, 8)):
            eid += 1
            rows.append(
                (
                    eid,
                    uid,
                    _ts(rng.randint(1, 22), rng.randint(0, 23), rng.randint(0, 59)),
                    0.0,
                    "click",
                )
            )
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    expect = _bitemporal_mirror(rows)
    got = {
        r.click_id: (
            r.user_id,
            r.ver_id,
            r.ver_cents,
            r.staleness_us,
            r.know_lag_us,
        )
        for r in REG["join_bitemporal_asof"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


# ---- join_interpolate_linear ------------------------------------------------


def _interp_mirror(orders):
    """orders: (key, custkey, date, price) -> {day: row tuple}."""
    per_day: dict[int, list[int]] = {}
    for _k, _c, dt, price in orders:
        per_day.setdefault(_us(dt) // _US_PER_DAY, []).append(
            math.floor(price * 100 + 0.5)
        )
    days = sorted(per_day)
    knots = {
        d: sum(per_day[d]) // len(per_day[d]) for d in days if d % 7 == 0
    }
    kd = sorted(knots)
    out = {}
    for d in days:
        lo = max((k for k in kd if k <= d), default=None)
        hi = min((k for k in kd if k >= d), default=None)
        if lo is None or hi is None:
            continue
        if hi == lo:
            v = float(knots[lo])
        else:
            v = knots[lo] + (knots[hi] - knots[lo]) * (d - lo) / (hi - lo)
        out[d] = (
            len(per_day[d]),
            lo,
            hi,
            math.floor(v * 1000 + 0.5),
        )
    return out


@pytest.mark.parametrize("seed", [1361, 1362, 1363])
def test_interpolate_linear_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    orders = [
        (
            k,
            rng.randint(1, 5),
            _ts(rng.randint(1, 28)),
            rng.uniform(1, 5000),
        )
        for k in range(1, rng.randint(10, 80))
    ]
    write_fixture(spark, tmp_path, "orders", orders, ORD_SCHEMA)
    expect = _interp_mirror(orders)
    got = {
        r.day: (
            r.n_orders,
            r.knot_lo_day,
            r.knot_hi_day,
            r.idx_interp_milli,
        )
        for r in REG["join_interpolate_linear"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


# ---- window_rolling_median --------------------------------------------------


@pytest.mark.parametrize("seed", [1371, 1372])
def test_rolling_median_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, eid = [], 0
    series: dict[str, dict[int, int]] = {}
    for t in ("a", "b"):
        for d in sorted(rng.sample(range(1, 29), rng.randint(3, 20))):
            tot = 0
            for _ in range(rng.randint(1, 4)):
                eid += 1
                v = rng.uniform(0.5, 300)
                tot += math.floor(v * 100 + 0.5)
                rows.append((eid, rng.randint(1, 5), _ts(d), v, t))
            series.setdefault(t, {})[_daynum(_ts(d))] = tot
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        (r.event_type, r.day): (r.rev_cents, r.n_window, r.median_cents_x2)
        for r in REG["window_rolling_median"].fn(spark, str(tmp_path)).collect()
    }
    expect = {}
    for t, per_day in series.items():
        days = sorted(per_day)
        for i, d in enumerate(days):
            win = [per_day[x] for x in days[max(0, i - 6) : i + 1]]
            expect[(t, d)] = (per_day[d], len(win), _median_x2(win))
    assert got == expect


# ---- sample_pps_systematic --------------------------------------------------


@pytest.mark.parametrize("seed", [1381, 1382, 1383])
def test_pps_systematic_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs = []
    for i in range(1, rng.randint(25, 120)):
        src = rng.choice(["web", "news", "wiki"])
        # heavy tail + occasional zero weight
        w = 0 if rng.random() < 0.05 else rng.randint(1, 2000)
        docs.append((i, src, w))
    rows = [(d, "x", "en", s, w) for d, s, w in docs]
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    expect = _pps_mirror(docs)
    got = {
        (r.source, r.doc_id): (r.weight_chars, r.n_hits)
        for r in REG["sample_pps_systematic"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
    per_src: dict[str, int] = {}
    for (s, _d), (_w, h) in got.items():
        per_src[s] = per_src.get(s, 0) + h
    for s, tot in per_src.items():
        assert tot == 20  # each source draws exactly k


# ---- events_haar_energy -----------------------------------------------------


@pytest.mark.parametrize("seed", [1391, 1392])
def test_haar_energy_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, eid = [], 0
    for t in ("x", "y", "z")[: rng.randint(1, 3)]:
        first = rng.randint(1, 3)
        for d in rng.sample(range(first, 29), rng.randint(1, 24)):
            for _ in range(rng.randint(1, 9)):
                eid += 1
                rows.append((eid, rng.randint(1, 4), _ts(d), 1.0, t))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {}
    for r in REG["events_haar_energy"].fn(spark, str(tmp_path)).collect():
        got.setdefault(r.event_type, {})[r.level] = (r.n_coeffs, r.energy)
    # the grid anchor is the CORPUS min day, not the per-type min
    all_min = min(_daynum(ts) for _e, _u, ts, _v, _t in rows)
    per_type: dict[str, dict[int, int]] = {}
    for _e, _u, ts, _v, t in rows:
        idx = _daynum(ts) - all_min
        if idx < 32:
            dc = per_type.setdefault(t, {})
            dc[idx] = dc.get(idx, 0) + 1
    expects = {t: _haar_mirror(dc) for t, dc in per_type.items()}
    assert got == expects


# ---- events_markov_stationary -----------------------------------------------


@pytest.mark.parametrize("seed", [1401, 1402, 1403])
def test_markov_stationary_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    types = ["view", "click", "buy", "refund"][: rng.randint(2, 4)]
    timelines = {
        uid: [rng.choice(types) for _ in range(rng.randint(2, 15))]
        for uid in range(1, rng.randint(3, 10))
    }
    rows, eid = [], 0
    for uid, seq in timelines.items():
        for i, t in enumerate(seq):
            eid += 1
            rows.append((eid, uid, _ts(1 + uid % 20, i % 24, eid % 60), 1.0, t))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    expect = _markov_mirror(timelines)
    got = {
        r.event_type: r.stationary_pico
        for r in REG["events_markov_stationary"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
    # mass conservation up to the documented truncation leak:
    # < |edges| pico per iteration + the uniform-init remainder
    assert (
        0
        <= 1_000_000_000_000 - sum(got.values())
        < 12 * len(types) ** 2 + len(types)
    )
