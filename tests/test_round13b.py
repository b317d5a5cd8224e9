"""Round-13 planted tests (batch 52): temporal joins, rolling median,
PPS sampling, Haar energy, Markov stationary distribution.

Every test hand-computes (or purely-Python mirrors) the expected
output on a planted fixture and compares the registry query exactly;
randomized replays live in test_round13b_random (slow lane).
"""

from __future__ import annotations

import datetime
import hashlib
import math

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()

EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, "
    "event_type string"
)
ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderdate timestamp, "
    "o_totalprice double"
)
DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

_US_PER_DAY = 86_400_000_000
_KNOW_CAP_US = 4 * 3_600_000_000


def _ts(day: int, hour: int = 0, minute: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour, minute)


def _us(dt: datetime.datetime) -> int:
    return int(dt.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)


def _h15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _cents(v: float) -> int:
    return math.floor(v * 100 + 0.5)


# ---- join_bitemporal_asof ---------------------------------------------------


def _know_us(ver_id: int, valid_us: int) -> int:
    return valid_us + _h15(f"{ver_id}|know42") % _KNOW_CAP_US


def _bitemporal_mirror(rows):
    """Pure-Python two-axis point-in-time lookup."""
    versions = [
        (uid, eid, _us(ts), _know_us(eid, _us(ts)), _cents(v))
        for eid, uid, ts, v, t in rows
        if t == "purchase"
    ]
    out = {}
    for eid, uid, ts, _v, t in rows:
        if t != "click":
            continue
        q = _us(ts)
        cands = [
            v
            for v in versions
            if v[0] == uid and v[2] <= q and v[3] <= q
        ]
        if not cands:
            continue
        best = max(cands, key=lambda v: (v[2], v[3], v[1]))
        out[eid] = (uid, best[1], best[4], q - best[2], q - best[3])
    return out


def test_bitemporal_asof_knowledge_axis(spark, tmp_path):
    """A click issued after a version became VALID but before it was
    KNOWN must read the older version — the leakage the plain as-of
    commits.  v2 is planted at the click's exact minute so its
    0..4 h pipeline delay makes it unknown at click time."""
    v1_ts, v2_ts = _ts(1, 0), _ts(2, 0)
    rows = [
        (101, 1, v1_ts, 10.0, "purchase"),
        (102, 1, v2_ts, 20.0, "purchase"),
        # click 1 min after v2 became valid: v2 known only if its
        # delay < 60 s (P ~ 1/240; assert from the mirror either way)
        (201, 1, _ts(2, 0, 1), 0.0, "click"),
        # click 5 h after v2: the <= 4 h delay cap guarantees known
        (202, 1, _ts(2, 5), 0.0, "click"),
        # click before ANY version is valid: no output row
        (200, 1, datetime.datetime(2023, 12, 30), 0.0, "click"),
    ]
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
    assert 200 not in got  # pre-history click yields nothing
    assert got[202][1] == 102  # 5 h later, v2 is both valid and known
    # the planted delay really is in (0, 4h): v2 unknown at 00:01
    if _h15("102|know42") % _KNOW_CAP_US > 60_000_000:
        assert got[201][1] == 101  # reads v1 although v2 is valid


def test_bitemporal_asof_tiebreak(spark, tmp_path):
    """Two versions share valid_us; the winner is the later-known one
    (know_us DESC), matching the documented tie contract."""
    ts = _ts(3, 0)
    rows = [
        (301, 7, ts, 1.0, "purchase"),
        (302, 7, ts, 2.0, "purchase"),
        (401, 7, _ts(4, 0), 0.0, "click"),  # > 4 h later: both known
    ]
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    expect = _bitemporal_mirror(rows)
    [r] = REG["join_bitemporal_asof"].fn(spark, str(tmp_path)).collect()
    assert (r.click_id, r.ver_id) == (401, expect[401][1])
    k1, k2 = _know_us(301, _us(ts)), _know_us(302, _us(ts))
    assert r.ver_id == (301 if k1 > k2 else 302 if k2 > k1 else 302)


# ---- join_interpolate_linear ------------------------------------------------


def _daynum(dt: datetime.datetime) -> int:
    return _us(dt) // _US_PER_DAY


def test_interpolate_linear_planted(spark, tmp_path):
    """Knot days reproduce their knot value exactly; a mid day lerps;
    days outside the knot span are excluded."""
    # find the first absolute day number divisible by 7 in Jan 2024
    base = next(
        d for d in range(1, 8) if _daynum(_ts(d)) % 7 == 0
    )
    k0, k1 = _daynum(_ts(base)), _daynum(_ts(base + 7))
    rows = [
        # knot 0: two orders, mean cents = (1000 + 2001) // 2 = 1500
        (1, 1, _ts(base), 10.00),
        (2, 1, _ts(base), 20.01),
        # knot 1: one order, 3000 cents
        (3, 1, _ts(base + 7), 30.00),
        # mid days: base+2 (lerp 2/7), base+5 (lerp 5/7)
        (4, 1, _ts(base + 2), 99.0),
        (5, 1, _ts(base + 5), 1.0),
        # outside the span on both sides: excluded
        (6, 1, _ts(base - 1) if base > 1 else _ts(base + 15), 5.0),
    ]
    write_fixture(spark, tmp_path, "orders", rows, ORD_SCHEMA)
    got = {
        r.day: (
            r.n_orders,
            r.knot_lo_day,
            r.knot_hi_day,
            r.idx_interp_milli,
        )
        for r in REG["join_interpolate_linear"].fn(spark, str(tmp_path)).collect()
    }
    y0, y1 = (1000 + 2001) // 2, 3000
    assert set(got) <= {k0, k0 + 2, k0 + 5, k1}
    assert got[k0] == (2, k0, k0, y0 * 1000)  # knot reproduces itself
    assert got[k1] == (1, k1, k1, y1 * 1000)
    for off in (2, 5):
        interp = y0 + (y1 - y0) * off / 7.0
        assert got[k0 + off] == (
            1,
            k0,
            k1,
            math.floor(interp * 1000 + 0.5),
        )


# ---- window_rolling_median --------------------------------------------------


def _median_x2(win: list[int]) -> int:
    s = sorted(win)
    n = len(s)
    return s[(n - 1) // 2] + s[n // 2]


def test_rolling_median_planted(spark, tmp_path):
    """9 observed days: windows grow 1..7 then slide; a planted spike
    day moves the MEAN but not the median (the robustness the rolling
    baseline exists for).  Days are non-contiguous to pin the ROWS
    (trailing 7 observed days) frame semantics."""
    days = [1, 2, 3, 5, 6, 9, 10, 12, 13]  # gaps at 4, 7-8, 11
    vals = [10, 20, 30, 40, 50, 9000, 60, 70, 80]  # day 9 is the spike
    rows = [
        (i + 1, 1, _ts(d), float(v), "a")
        for i, (d, v) in enumerate(zip(days, vals))
    ]
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r.day: (r.rev_cents, r.n_window, r.median_cents_x2)
        for r in REG["window_rolling_median"].fn(spark, str(tmp_path)).collect()
    }
    daynums = [_daynum(_ts(d)) for d in days]
    cents = [v * 100 for v in vals]
    for i, dn in enumerate(daynums):
        win = cents[max(0, i - 6) : i + 1]
        assert got[dn] == (cents[i], len(win), _median_x2(win))
    # the spike day's median ignores the spike (robustness)
    i = days.index(9)
    assert (
        got[daynums[i]][2]
        == _median_x2(cents[max(0, i - 6) : i + 1])
        < 9000 * 100
    )


# ---- sample_pps_systematic --------------------------------------------------

_PPS_K = 20


def _pps_mirror(docs):
    """docs: list of (doc_id, source, w)."""
    out = {}
    by_src: dict[str, list] = {}
    for doc_id, source, w in docs:
        if w > 0:
            by_src.setdefault(source, []).append(
                (hashlib.md5(f"{doc_id}|pps42".encode()).hexdigest(), doc_id, w)
            )
    for source, items in by_src.items():
        items.sort()
        t = sum(w for _h, _d, w in items)
        cum = 0

        def f(c: int) -> int:
            if 2 * _PPS_K * c < t:
                return 0
            return min(_PPS_K, (2 * _PPS_K * c - t) // (2 * t) + 1)

        for _h, doc_id, w in items:
            cum += w
            hits = f(cum) - f(cum - w)
            if hits > 0:
                out[(source, doc_id)] = (w, hits)
    return out


def test_pps_systematic_planted(spark, tmp_path):
    """One source: exactly k = 20 draws land, a 10x-heavy doc takes
    multiple hits, zero-weight docs are excluded."""
    docs = [(i, "web", 100) for i in range(1, 20)]
    docs.append((99, "web", 1000))  # the heavy doc
    docs.append((100, "web", 0))  # zero weight: excluded
    rows = [
        (doc_id, "t" * max(w, 1), "en", source, w)
        for doc_id, source, w in docs
    ]
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    expect = _pps_mirror(docs)
    got = {
        (r.source, r.doc_id): (r.weight_chars, r.n_hits)
        for r in REG["sample_pps_systematic"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
    assert sum(h for _w, h in got.values()) == _PPS_K  # k total draws
    # the heavy doc owns ~1000/2900 of the line: >= 6 of 20 hits
    assert got[("web", 99)][1] >= 6
    assert ("web", 100) not in got


def test_pps_systematic_two_sources_independent(spark, tmp_path):
    """Each source draws its own k = 20 grid: totals are per-source."""
    docs = [(i, "web", 50 + i) for i in range(1, 9)]
    docs += [(100 + i, "news", 10 * i) for i in range(1, 6)]
    rows = [(d, "x" * w, "en", s, w) for d, s, w in docs]
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = {}
    for r in REG["sample_pps_systematic"].fn(spark, str(tmp_path)).collect():
        got.setdefault(r.source, 0)
        got[r.source] += r.n_hits
    assert got == {"web": _PPS_K, "news": _PPS_K}


# ---- events_haar_energy -----------------------------------------------------


def _haar_mirror(day_counts: dict[int, int]) -> dict[int, tuple[int, int]]:
    """day_counts: {relative day idx: count} -> {level: (n_coeffs, energy)}."""
    x = [day_counts.get(i, 0) for i in range(32)]
    out = {}
    for level in range(1, 6):
        d = [x[2 * i] - x[2 * i + 1] for i in range(len(x) // 2)]
        s = [x[2 * i] + x[2 * i + 1] for i in range(len(x) // 2)]
        out[level] = (len(d), sum(v * v for v in d))
        x = s
    return out


def test_haar_energy_impulse_and_step(spark, tmp_path):
    """An impulse (1 event on the first day) carries energy 1 at
    every level; a constant series carries 0 everywhere; a one-step
    drop concentrates energy at the level whose support spans it."""
    rows, eid = [], 0
    # impulse type: one event on day 1 only
    eid += 1
    rows.append((eid, 1, _ts(1), 1.0, "impulse"))
    # constant type: 2 events every day 1..28 (the fixture month cap)
    for d in range(1, 29):
        for _ in range(2):
            eid += 1
            rows.append((eid, 2, _ts(d), 1.0, "flat"))
    # step type: 4 events/day on days 1..16, none after
    for d in range(1, 17):
        for _ in range(4):
            eid += 1
            rows.append((eid, 3, _ts(d), 1.0, "step"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {}
    for r in REG["events_haar_energy"].fn(spark, str(tmp_path)).collect():
        got.setdefault(r.event_type, {})[r.level] = (r.n_coeffs, r.energy)
    assert got["impulse"] == _haar_mirror({0: 1})
    assert got["impulse"][5] == (1, 1)  # survives to the top level
    assert got["flat"] == _haar_mirror({i: 2 for i in range(28)})
    assert got["step"] == _haar_mirror({i: 4 for i in range(16)})
    # the 16-day step is invisible below level 5 (pairs are equal
    # inside each half) and all of its energy sits at level 5
    assert [got["step"][lv][1] for lv in range(1, 5)] == [0, 0, 0, 0]
    assert got["step"][5][1] == 64 * 64  # (sum 64) - (sum 0) squared


# ---- events_markov_stationary -----------------------------------------------

_GRID = 1_000_000_000_000


def _markov_mirror(timelines: dict[int, list[str]]) -> dict[str, int]:
    cnt: dict[tuple[str, str], int] = {}
    nodes = set()
    for seq in timelines.values():
        nodes.update(seq)
        for a, b in zip(seq, seq[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    row = {}
    for (a, _b), c in cnt.items():
        row[a] = row.get(a, 0) + c
    nodes = sorted(nodes)
    x = {n: _GRID // len(nodes) for n in nodes}
    for _ in range(12):
        nxt = {n: 0 for n in nodes}
        for (a, b), c in cnt.items():
            nxt[b] += x[a] * c // row[a]
        x = nxt
    return x


def test_markov_stationary_two_state_flip(spark, tmp_path):
    """A strict A-B-A-B timeline: P is the swap matrix, the uniform
    start is already stationary — mass stays GRID/2 on each."""
    rows = [
        (i + 1, 1, _ts(1, i), 1.0, "A" if i % 2 == 0 else "B")
        for i in range(10)
    ]
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r.event_type: r.stationary_pico
        for r in REG["events_markov_stationary"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {"A": _GRID // 2, "B": _GRID // 2}


def test_markov_stationary_absorbing_sink(spark, tmp_path):
    """Every user funnels view -> click -> buy and stops at buy
    (self-loop via a repeat): mass drains into the absorbing state;
    mirror the exact integer iteration."""
    timelines = {
        1: ["view", "click", "buy", "buy"],
        2: ["view", "click", "buy", "buy"],
        3: ["view", "view", "click", "buy", "buy"],
    }
    rows, eid = [], 0
    for uid, seq in timelines.items():
        for i, t in enumerate(seq):
            eid += 1
            rows.append((eid, uid, _ts(1 + uid, i), 1.0, t))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    expect = _markov_mirror(timelines)
    got = {
        r.event_type: r.stationary_pico
        for r in REG["events_markov_stationary"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
    assert got["buy"] > got["view"] and got["buy"] > got["click"]
