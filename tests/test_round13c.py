"""Round-13 planted tests (batch 53): FIFO allocation, Hampel
outliers, U-shaped attribution, Lorenz curve, Simpson diversity,
best-split SSE, type-pair audience Jaccard.

Randomized replays live in test_round13c_random (slow lane).
"""

from __future__ import annotations

import datetime
import math

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()

EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, "
    "event_type string"
)
LI_SCHEMA = (
    "l_orderkey long, l_linenumber int, l_partkey long, "
    "l_returnflag string, l_shipdate timestamp, l_quantity double"
)
DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

_US_PER_DAY = 86_400_000_000


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour)


def _us(dt: datetime.datetime) -> int:
    return int(dt.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)


def _daynum(dt: datetime.datetime) -> int:
    return _us(dt) // _US_PER_DAY


# ---- orders_fifo_allocation -------------------------------------------------


def _fifo_mirror(lines):
    """lines: (okey, line, part, flag, shipday, qty) -> pair dict."""
    out = {}
    parts = {p for _o, _l, p, _f, _d, _q in lines}
    for part in parts:
        def stream(flag):
            rows = sorted(
                (d, o, l, q)
                for o, l, p, f, d, q in lines
                if p == part and f == flag
            )
            cum, res = 0, []
            for d, o, l, q in rows:
                cum += q
                res.append((o, l, q, cum))
            return res

        rcv, ret = stream("N"), stream("R")
        for ro, rl, rq, rcum in rcv:
            for to, tl, tq, tcum in ret:
                lo = max(rcum - rq, tcum - tq)
                hi = min(rcum, tcum)
                if lo < hi:
                    out[(part, to, tl, ro, rl)] = hi - lo
    return out


def test_fifo_allocation_planted(spark, tmp_path):
    """Receipts [5, 3, 7] vs returns [4, 6] on one part: the FIFO
    ledger is d1<-r1:4, d2<-r1:1, d2<-r2:3, d2<-r3:2 — the second
    return straddles three receipts; supply beyond demand stays
    unmatched."""
    lines = [
        (1, 1, 77, "N", 1, 5),
        (2, 1, 77, "N", 2, 3),
        (3, 1, 77, "N", 3, 7),
        (4, 1, 77, "R", 4, 4),
        (5, 1, 77, "R", 5, 6),
    ]
    rows = [
        (o, l, p, f, _ts(d), float(q)) for o, l, p, f, d, q in lines
    ]
    write_fixture(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    got = {
        (r.l_partkey, r.ret_orderkey, r.ret_linenumber, r.rcv_orderkey,
         r.rcv_linenumber): r.matched_qty
        for r in REG["orders_fifo_allocation"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {
        (77, 4, 1, 1, 1): 4,
        (77, 5, 1, 1, 1): 1,
        (77, 5, 1, 2, 1): 3,
        (77, 5, 1, 3, 1): 2,
    }
    assert got == _fifo_mirror(lines)
    assert sum(got.values()) == 10  # total demand fully served


def test_fifo_allocation_excess_demand(spark, tmp_path):
    """Demand beyond total supply is silently unmatched: matched
    total == total supply."""
    lines = [
        (1, 1, 9, "N", 1, 3),
        (2, 1, 9, "R", 2, 5),
        (3, 1, 9, "R", 3, 4),
    ]
    rows = [(o, l, p, f, _ts(d), float(q)) for o, l, p, f, d, q in lines]
    write_fixture(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    got = {
        (r.ret_orderkey, r.rcv_orderkey): r.matched_qty
        for r in REG["orders_fifo_allocation"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {(2, 1): 3}  # only the first return reaches supply


# ---- window_hampel_outliers ---------------------------------------------------


def _hampel_mirror(series):
    """series: ordered (day, rev) -> {day: (n, med2, mad2, flag)}."""
    out = {}
    revs = [r for _d, r in series]
    for i, (d, r) in enumerate(series):
        win = sorted(revs[max(0, i - 6) : i + 1])
        n = len(win)
        med2 = win[(n - 1) // 2] + win[n // 2]
        devs = sorted(abs(2 * v - med2) for v in win)
        mad2 = devs[(n - 1) // 2] + devs[n // 2]
        dev = abs(2 * r - med2)
        out[d] = (n, med2, mad2, n >= 5 and dev * 10000 > mad2 * 22239)
    return out


def test_hampel_planted_spike(spark, tmp_path):
    """Constant 100-cent days, then a 10x spike on day 8: the spike
    flags (zero MAD degeneracy), the early small-window days never
    flag even when deviant."""
    days = list(range(1, 9))
    vals = [1.0] * 7 + [10.0]
    rows = [
        (i + 1, 1, _ts(d), v, "a") for i, (d, v) in enumerate(zip(days, vals))
    ]
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r.day: (r.n_window, r.med_x2, r.mad_x2, r.is_outlier)
        for r in REG["window_hampel_outliers"].fn(spark, str(tmp_path)).collect()
    }
    series = [(_daynum(_ts(d)), v * 100) for d, v in zip(days, vals)]
    assert got == _hampel_mirror(series)
    spike_day = _daynum(_ts(8))
    assert got[spike_day] == (7, 200, 0, True)
    assert not any(f for d, (_n, _m, _md, f) in got.items() if d != spike_day)


def test_hampel_small_window_never_flags(spark, tmp_path):
    """A wild second day cannot flag: n_window < 5 is suppressed."""
    rows = [
        (1, 1, _ts(1), 1.0, "a"),
        (2, 1, _ts(2), 99.0, "a"),
        (3, 1, _ts(3), 1.0, "a"),
    ]
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = REG["window_hampel_outliers"].fn(spark, str(tmp_path)).collect()
    assert not any(r.is_outlier for r in got)


# ---- events_attribution_credit ------------------------------------------------

_PPM = 1_000_000
_WIN_US = 7 * _US_PER_DAY


def _attr_mirror(rows):
    """rows: EV tuples -> {touch_type: (n_touches, n_convs, credit)}."""
    convs = [
        (uid, eid, _us(ts))
        for eid, uid, ts, _v, t in rows
        if t == "purchase"
    ]
    out: dict[str, list] = {}
    for uid, cid, cus in convs:
        touches = sorted(
            (_us(ts), eid, t)
            for eid, u, ts, _v, t in rows
            if u == uid
            and t != "purchase"
            and cus - _WIN_US <= _us(ts) < cus
        )
        k = len(touches)
        for rk, (_tus, _tid, t) in enumerate(touches, 1):
            if k == 1:
                c = _PPM
            elif k == 2:
                c = _PPM // 2
            elif rk == 1:
                c = 2 * _PPM // 5 + (_PPM // 5 - (k - 2) * (_PPM // 5 // (k - 2)))
            elif rk == k:
                c = 2 * _PPM // 5
            else:
                c = _PPM // 5 // (k - 2)
            rec = out.setdefault(t, [0, set(), 0])
            rec[0] += 1
            rec[1].add(cid)
            rec[2] += c
    return {t: (n, len(cs), c) for t, (n, cs, c) in out.items()}


def test_attribution_credit_planted(spark, tmp_path):
    """Three conversions: k=1 (100%), k=2 (50/50), k=5 (40% + rem /
    3x6.666% / 40%).  Touch at conv time and touch 8 days out are
    both excluded."""
    rows = [
        # user 1: one touch -> 100%
        (1, 1, _ts(3), 0.0, "view"),
        (2, 1, _ts(4), 9.0, "purchase"),
        # user 2: two touches -> 50/50
        (3, 2, _ts(2), 0.0, "view"),
        (4, 2, _ts(3), 0.0, "click"),
        (5, 2, _ts(5), 9.0, "purchase"),
        # user 3: five touches -> 400000+rem, 66666 x3, 400000
        (6, 3, _ts(10, 1), 0.0, "view"),
        (7, 3, _ts(10, 2), 0.0, "click"),
        (8, 3, _ts(10, 3), 0.0, "view"),
        (9, 3, _ts(10, 4), 0.0, "click"),
        (10, 3, _ts(10, 5), 0.0, "view"),
        (11, 3, _ts(11), 9.0, "purchase"),
        # excluded: AT conversion time (user 4), and 8 days before
        (12, 4, _ts(20), 0.0, "view"),
        (13, 4, _ts(20), 9.0, "purchase"),
        (14, 5, _ts(1), 0.0, "view"),
        (15, 5, _ts(9), 9.0, "purchase"),
    ]
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    expect = _attr_mirror(rows)
    got = {
        r.event_type: (r.n_touches, r.n_conversions, r.credit_ppm_total)
        for r in REG["events_attribution_credit"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
    # every fully-attributed conversion sums to exactly 1e6:
    # 3 conversions with touches -> 3e6 ppm total over all types
    assert sum(v[2] for v in got.values()) == 3 * _PPM
    # the k=5 middle credits: 200000 DIV 3 = 66666, rem 2 -> first.
    # view holds ranks 1/3/5 of the k=5 chain: 400002 + 66666 + 400000
    assert got["view"][2] == _PPM + _PPM // 2 + (400000 + 2) + 66666 + 400000
    # click holds ranks 2/4: 66666 + 66666
    assert got["click"][2] == _PPM // 2 + 66666 + 66666


# ---- text_lorenz_curve --------------------------------------------------------


def test_lorenz_curve_planted(spark, tmp_path):
    """Weights [1, 2, 3, 4]: k_p = 4p DIV 100, shares 1/10, 3/10,
    6/10, 10/10 at k = 1..4; the p=100 point is exactly 1e6."""
    rows = [(i, "x" * i, "en", "web", i) for i in (1, 2, 3, 4)]
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = {
        r.p_pct: (r.k_docs, r.lorenz_ppm)
        for r in REG["text_lorenz_curve"].fn(spark, str(tmp_path)).collect()
    }
    cum = {1: 1, 2: 3, 3: 6, 4: 10}
    expect = {}
    for p in range(10, 101, 10):
        k = 4 * p // 100
        expect[p] = (k, cum[k] * _PPM // 10 if k else 0)
    assert got == expect
    assert got[100] == (4, _PPM)
    assert got[10] == (0, 0)


# ---- text_simpson_diversity ---------------------------------------------------


def test_simpson_diversity_planted(spark, tmp_path):
    """'a a b' -> lambda = 2/6; a single-token source is excluded;
    a one-word corpus reads exactly 1e6."""
    rows = [
        (1, "a a b", "en", "web", 5),
        (2, "x", "en", "tiny", 1),
        (3, "same same", "en", "mono", 9),
        (4, "same same same", "en", "mono", 14),
    ]
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = {
        r.source: (r.vocab, r.n_tokens, r.simpson_ppm)
        for r in REG["text_simpson_diversity"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {
        "web": (2, 3, 2 * _PPM // 6),
        "mono": (1, 5, _PPM),
    }
    assert "tiny" not in got


# ---- events_best_split_sse ----------------------------------------------------


def test_best_split_planted(spark, tmp_path):
    """Daily counts [1,1,1,9,9]: the level shift after day 3 gives a
    perfect split (SSE 0); the global SSE is 76.8."""
    rows, eid = [], 0
    for d, c in zip(range(1, 6), (1, 1, 1, 9, 9)):
        for _ in range(c):
            eid += 1
            rows.append((eid, 1, _ts(d), 1.0, "a"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["events_best_split_sse"].fn(spark, str(tmp_path)).collect()
    assert r.event_type == "a" and r.n_days == 5
    assert r.split_day == _daynum(_ts(3))
    assert r.sse_split_milli == 0
    # total: S2=165, S1=21, n=5 -> 165 - 88.2 = 76.8
    assert r.sse_total_milli == 76800


def test_best_split_tie_breaks_to_earliest(spark, tmp_path):
    """A constant series: every split has SSE 0 — the earliest day
    wins; a single-day type is excluded entirely."""
    rows, eid = [], 0
    for d in range(1, 5):
        eid += 1
        rows.append((eid, 1, _ts(d), 1.0, "flat"))
    eid += 1
    rows.append((eid, 2, _ts(1), 1.0, "lone"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r.event_type: r
        for r in REG["events_best_split_sse"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"flat"}
    assert got["flat"].split_day == _daynum(_ts(1))
    assert got["flat"].sse_split_milli == got["flat"].sse_total_milli == 0


# ---- events_type_user_jaccard -------------------------------------------------


def test_type_user_jaccard_planted(spark, tmp_path):
    """A: {1,2,3}, B: {2,3,4} -> J = 2/4; C: {9} disjoint from both
    (no output rows — co >= 1 pairs only); duplicate events per
    (type, user) collapse."""
    rows, eid = [], 0
    for t, uids in (("A", [1, 2, 3, 3]), ("B", [2, 3, 4]), ("C", [9])):
        for u in uids:
            eid += 1
            rows.append((eid, u, _ts(1 + eid % 20), 1.0, t))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        (r.ta, r.tb): (r.n_shared, r.n_a, r.n_b, r.jaccard_ppm)
        for r in REG["events_type_user_jaccard"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {("A", "B"): (2, 3, 3, 2 * _PPM // 4)}


# ---- stats_psi_drift ----------------------------------------------------------


def _psi_mirror(rows):
    """rows: EV tuples -> {type: (n_pre, n_post, n_bins, psi, band)}."""
    ev = [
        (t, _us(ts), math.floor(v * 10))
        for _e, _u, ts, v, t in rows
        if v is not None
    ]
    uss = [u for _t, u, _b in ev]
    mid = (min(uss) + max(uss)) // 2
    per: dict[str, dict[int, list[int]]] = {}
    for t, u, b in ev:
        d = per.setdefault(t, {})
        pre, post = d.get(b, [0, 0])
        if u <= mid:
            pre += 1
        else:
            post += 1
        d[b] = [pre, post]
    out = {}
    for t, bins in per.items():
        tpre = sum(p for p, _q in bins.values())
        tpost = sum(q for _p, q in bins.values())
        if tpre == 0 or tpost == 0:
            continue
        psi = 0.0
        for pre, post in bins.values():
            p = max(pre / tpre, 1e-6)
            q = max(post / tpost, 1e-6)
            psi += (p - q) * math.log(p / q)
        psi = round(psi, 6)
        band = "stable" if psi < 0.10 else "moderate" if psi < 0.25 else "major"
        out[t] = (tpre, tpost, len(bins), psi, band)
    return out


def test_psi_drift_planted(spark, tmp_path):
    """Type 'same' has identical halves (PSI 0, stable); type 'shift'
    moves all mass to a new bin post-midpoint (floored shares, major);
    type 'lone' exists only pre-midpoint and is excluded."""
    rows, eid = [], 0
    for d in (1, 2, 27, 28):  # two events per half, same value bins
        for v in (1.0, 2.0):
            eid += 1
            rows.append((eid, 1, _ts(d), v, "same"))
    for d in (1, 2):
        eid += 1
        rows.append((eid, 1, _ts(d), 5.0, "shift"))
    for d in (27, 28):
        eid += 1
        rows.append((eid, 1, _ts(d), 50.0, "shift"))
    eid += 1
    rows.append((eid, 1, _ts(1), 9.0, "lone"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    expect = _psi_mirror(rows)
    got = {
        r.event_type: (r.n_pre, r.n_post, r.n_bins, r.psi, r.band)
        for r in REG["stats_psi_drift"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(expect) == {"same", "shift"}
    for t in got:
        assert got[t][:3] == expect[t][:3]
        assert abs(got[t][3] - expect[t][3]) <= 2e-6
        assert got[t][4] == expect[t][4]
    assert got["same"][3] == 0.0 and got["same"][4] == "stable"
    # total separation: each bin contributes ~(1 - 1e-6) * ln(1e6)
    assert got["shift"][4] == "major" and got["shift"][3] > 20.0
