"""Round-13 planted tests (batch 51): the bucketed trimmed-mean scale
path and the experiment-health statistics battery.

Every test hand-computes (or purely-Python mirrors) the expected
output on a planted fixture and compares the registry query exactly;
randomized replays live in test_round13_random (slow lane).
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
LI_SCHEMA = (
    "l_orderkey long, l_linenumber int, l_returnflag string, "
    "l_quantity double"
)

_US_PER_DAY = 86_400_000_000


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour)


def _h15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _cents(v: float) -> int:
    return math.floor(v * 100 + 0.5)


# ---- agg_trimmed_mean_bucketed ---------------------------------------------


def test_trimmed_mean_bucketed_planted(spark, tmp_path):
    """10 values 10..100 cents in one flag: k = 1 trims exactly the
    min and max, kept sum 20+...+90 = 440 over 8 values."""
    rows = [(i, 1, "A", i / 10.0) for i in range(1, 11)]  # 0.1 .. 1.0
    write_fixture(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    [r] = (
        REG["agg_trimmed_mean_bucketed"].fn(spark, str(tmp_path)).collect()
    )
    assert (r.l_returnflag, r.n_all, r.n_kept) == ("A", 10, 8)
    assert r.trimmed_mean_cents_milli == 440 * 1000 // 8


def test_trimmed_mean_bucketed_equals_exact_rank_form(spark, tmp_path):
    """The bucketed form must reproduce the exact-rank form row for
    row, INCLUDING heavy ties across the trim boundary (the case
    where 'equal values are interchangeable' does the work)."""
    rows, key = [], 0
    for flag, vals in (
        ("A", [5] * 7 + [7] * 5 + [9] * 8),  # k = 2 lands inside ties
        ("B", [1, 1, 1, 1]),  # all equal
        ("C", list(range(1, 26))),  # distinct run, k = 2
    ):
        for v in vals:
            key += 1
            rows.append((key, key % 3 + 1, flag, float(v)))
    write_fixture(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    bucketed = {
        r.l_returnflag: (r.n_all, r.n_kept, r.trimmed_mean_cents_milli)
        for r in REG["agg_trimmed_mean_bucketed"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    exact = {
        r.l_returnflag: (r.n_all, r.n_kept, r.trimmed_mean_cents_milli)
        for r in REG["agg_trimmed_mean"].fn(spark, str(tmp_path)).collect()
    }
    assert bucketed == exact and set(bucketed) == {"A", "B", "C"}


# ---- stats_delta_method_ratio ----------------------------------------------


def _delta_mirror(rows):
    """Pure-Python delta-method mirror (user-level units)."""
    per: dict[int, list[int]] = {}
    for _eid, uid, _t, v, _e in rows:
        per.setdefault(uid, []).append(_cents(v))
    arms: dict[int, list[tuple[int, int]]] = {0: [], 1: []}
    for uid, xs in per.items():
        arms[_h15(f"{uid}|dmr42") % 2].append((sum(xs), len(xs)))
    out = {}
    for g, units in arms.items():
        n = len(units)
        sx = float(sum(x for x, _ in units))
        sy = float(sum(y for _, y in units))
        sxx = float(sum(x * x for x, _ in units))
        syy = float(sum(y * y for _, y in units))
        sxy = float(sum(x * y for x, y in units))
        r = sx / sy
        d = sxx - 2.0 * r * sxy + r * r * syy
        se2 = (
            d * n / ((n - 1) * sy * sy) if n > 1 and d >= 0 else None
        )
        out[g] = (n, r, se2)
    return out


def test_delta_method_ratio_planted(spark, tmp_path):
    rows = []
    eid = 0
    for uid in range(1, 13):
        for k in range(uid % 4 + 1):  # varying events per user
            eid += 1
            rows.append((eid, uid, _ts(1 + eid % 20), 1.0 + uid + k, "a"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    m = _delta_mirror(rows)
    (n0, r0, se20), (n1, r1, se21) = m[0], m[1]
    delta = r1 - r0
    se = math.sqrt(se20 + se21)
    z = delta / se
    [r] = REG["stats_delta_method_ratio"].fn(spark, str(tmp_path)).collect()
    assert (r.n_users_a, r.n_users_b) == (n0, n1)
    assert r.ratio_a_ppm == math.floor(r0 * 1e6 + 0.5)
    assert r.ratio_b_ppm == math.floor(r1 * 1e6 + 0.5)
    assert r.delta_ppm == math.floor(delta * 1e6 + 0.5)
    assert r.se_ppm == math.floor(se * 1e6 + 0.5)
    assert r.z_milli == math.floor(z * 1000 + 0.5)
    assert r.ci_lo_ppm == math.floor((delta - 1.96 * se) * 1e6 + 0.5)
    assert r.ci_hi_ppm == math.floor((delta + 1.96 * se) * 1e6 + 0.5)
    assert r.significant == (abs(z) > 1.96)
    assert not r.degenerate


def test_delta_method_ratio_degenerate_single_users(spark, tmp_path):
    """One user per arm: n = 1 makes the delta-method variance
    undefined -> the explicit degenerate flag with 0 sentinels and
    the CI collapsed onto delta (NULL longs would cross the engine
    boundary as None-vs-NaN)."""
    uid0 = next(u for u in range(1, 50) if _h15(f"{u}|dmr42") % 2 == 0)
    uid1 = next(u for u in range(1, 50) if _h15(f"{u}|dmr42") % 2 == 1)
    rows = [
        (1, uid0, _ts(1), 10.0, "a"),
        (2, uid0, _ts(2), 20.0, "a"),
        (3, uid1, _ts(3), 40.0, "a"),
    ]
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_delta_method_ratio"].fn(spark, str(tmp_path)).collect()
    assert r.degenerate
    assert (r.n_users_a, r.n_users_b) == (1, 1)
    assert r.ratio_a_ppm == 1500 * 1_000_000  # (1000+2000)/2 cents/event
    assert r.ratio_b_ppm == 4000 * 1_000_000
    assert r.se_ppm == 0 and r.z_milli == 0 and r.significant is False
    assert r.ci_lo_ppm == r.ci_hi_ppm == r.delta_ppm == 2500 * 1_000_000


# ---- stats_two_proportion_z ------------------------------------------------


def test_two_proportion_z_planted(spark, tmp_path):
    rows, eid = [], 0
    converted = {}
    for uid in range(1, 21):
        conv = uid % 3 == 0
        converted[uid] = conv
        eid += 1
        rows.append((eid, uid, _ts(1 + uid % 25), 1.0, "view"))
        if conv:
            eid += 1
            rows.append((eid, uid, _ts(2 + uid % 25), 5.0, "purchase"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    arms = {0: [], 1: []}
    for uid, conv in converted.items():
        arms[_h15(f"{uid}|2pz42") % 2].append(conv)
    n0, n1 = len(arms[0]), len(arms[1])
    x0, x1 = sum(arms[0]), sum(arms[1])
    p0, p1 = x0 / n0, x1 / n1
    pp = (x0 + x1) / (n0 + n1)
    se = math.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1))
    z = (p1 - p0) / se
    [r] = REG["stats_two_proportion_z"].fn(spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (n0, n1, x0, x1)
    assert r.rate_a_ppm == math.floor(p0 * 1e6 + 0.5)
    assert r.rate_b_ppm == math.floor(p1 * 1e6 + 0.5)
    assert not r.degenerate
    assert r.z_milli == math.floor(z * 1000 + 0.5)
    assert r.significant == (abs(z) > 1.96)


def test_two_proportion_z_degenerate_all_convert(spark, tmp_path):
    """Everyone purchases: pooled rate 1 -> zero variance -> the
    explicit degenerate flag with 0/false sentinels (a NULL long
    would cross the engine boundary as None-vs-NaN)."""
    rows = [
        (uid, uid, _ts(1 + uid), 5.0, "purchase") for uid in range(1, 9)
    ]
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_two_proportion_z"].fn(spark, str(tmp_path)).collect()
    assert r.degenerate and r.z_milli == 0 and r.significant is False
    assert r.rate_a_ppm == r.rate_b_ppm == 1_000_000


# ---- stats_srm_check -------------------------------------------------------


def test_srm_check_planted(spark, tmp_path):
    rows, eid = [], 0
    for uid in range(1, 31):
        for t in ("view", "click") if uid % 2 else ("view",):
            eid += 1
            rows.append((eid, uid, _ts(1 + uid % 25), 1.0, t))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    seen: dict[str, dict[int, set]] = {}
    for _eid, uid, _t, _v, t in rows:
        g = _h15(f"{uid}|2pz42") % 2
        seen.setdefault(t, {0: set(), 1: set()})[g].add(uid)
        seen.setdefault("_overall", {0: set(), 1: set()})[g].add(uid)
    expect = {}
    for t, arms in seen.items():
        n0, n1 = len(arms[0]), len(arms[1])
        chi2 = (n0 - n1) ** 2 / (n0 + n1)
        expect[t] = (
            n0,
            n1,
            math.floor(chi2 * 1000 + 0.5),
            chi2 > 3.841459,
        )
    got = {
        r.event_type: (r.n_arm_a, r.n_arm_b, r.chi2_milli, r.srm_detected)
        for r in REG["stats_srm_check"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


def test_srm_check_detects_broken_split(spark, tmp_path):
    """A heavily imbalanced exposure (one arm starved by a buggy
    gate) must trip the overall SRM flag: we plant users whose
    hashes land 0 but log only arm-1 users for 'click'."""
    rows, eid = [], 0
    uids0 = [u for u in range(1, 200) if _h15(f"{u}|2pz42") % 2 == 0][:40]
    uids1 = [u for u in range(1, 200) if _h15(f"{u}|2pz42") % 2 == 1][:40]
    for uid in uids0 + uids1:
        eid += 1
        rows.append((eid, uid, _ts(1 + uid % 25), 1.0, "view"))
    for uid in uids1:  # the broken gate: only arm-1 users click
        eid += 1
        rows.append((eid, uid, _ts(2 + uid % 25), 1.0, "click"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r.event_type: r
        for r in REG["stats_srm_check"].fn(spark, str(tmp_path)).collect()
    }
    assert not got["_overall"].srm_detected  # 40/40 by construction
    assert not got["view"].srm_detected
    assert got["click"].srm_detected  # 0 vs 40: chi2 = 40
    assert got["click"].chi2_milli == 40_000


# ---- stats_capture_recapture -----------------------------------------------


def test_capture_recapture_planted(spark, tmp_path):
    """Half A sees users 1..10, half B sees 6..13 (overlap 5):
    Chapman = 11*9 DIV 6 - 1 = 15 vs true 13."""
    rows, eid = [], 0
    for uid in range(1, 11):  # first half: days 1..4
        eid += 1
        rows.append((eid, uid, _ts(1 + uid % 4), 1.0, "a"))
    for uid in range(6, 14):  # second half: days 20..23
        eid += 1
        rows.append((eid, uid, _ts(20 + uid % 4), 1.0, "a"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_capture_recapture"].fn(spark, str(tmp_path)).collect()
    assert (r.n_first_half, r.n_second_half, r.n_recaptured) == (10, 8, 5)
    assert r.true_total == 13
    assert r.chapman_est == (11 * 9) // 6 - 1 == 15
    assert r.err_ppm == abs(15 - 13) * 1_000_000 // 13


# ---- stats_holm_bonferroni -------------------------------------------------


def test_holm_rejects_prefix_only(spark, tmp_path):
    """Holm is a step-down: once a rank fails its threshold, no later
    rank can be rejected even if its raw p would pass Bonferroni.
    Planted: type 'shift' has a large post-midpoint level shift
    (tiny p), 'noise1/2' do not.  Verify against the pure-Python
    Welch mirror (shared with the bh_fdr replay) and the step-down
    property rejected_i => rejected_{i-1}."""
    from tests.test_round11_random import _p_two, _welch_z

    rows, eid = [], 0
    for t, shift in (("shift", 50.0), ("noise1", 0.0), ("noise2", 0.1)):
        for i in range(24):
            eid += 1
            day = 1 + (i % 24)
            v = 10.0 + (i % 5) + (shift if day > 12 else 0.0)
            rows.append((eid, 1 + eid % 7, _ts(day), v, t))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)

    us = [
        int(r[2].replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)
        for r in rows
    ]
    mid = (min(us) + max(us)) // 2
    zs = {}
    for t in ("shift", "noise1", "noise2"):
        pre = [_cents(r[3]) for r, u in zip(rows, us) if r[4] == t and u <= mid]
        post = [_cents(r[3]) for r, u in zip(rows, us) if r[4] == t and u > mid]
        z = _welch_z(pre, post)
        if z is not None:
            zs[t] = z
    ps = {t: _p_two(abs(z)) for t, z in zs.items()}
    m = len(ps)
    order = sorted(ps, key=lambda t: (ps[t], t))
    runmax, expect = 0.0, {}
    for i, t in enumerate(order, 1):
        runmax = max(runmax, ps[t] * (m - i + 1))
        expect[t] = (
            math.floor(zs[t] * 1000 + 0.5),
            i,
            m,
            math.floor(min(1.0, runmax) * 1e6 + 0.5),
            runmax <= 0.05,
        )
    got = {
        r.event_type: (r.z_milli, r.p_rank, r.m, r.p_holm_ppm, r.rejected)
        for r in REG["stats_holm_bonferroni"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
    assert got["shift"][4] is True  # the planted shift is rejected
    # step-down property: rejections form a prefix of the p-ranking
    ranks_rejected = sorted(v[1] for v in got.values() if v[4])
    assert ranks_rejected == list(range(1, len(ranks_rejected) + 1))
