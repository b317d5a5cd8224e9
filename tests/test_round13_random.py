"""Randomized independent-implementation replays for the round-13
operators (slow certification lane): every draw builds a random
fixture, runs the registry query, and checks EXACT equality against a
pure-Python mirror written independently of the Spark/SQL code.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import random

import pytest

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

pytestmark = pytest.mark.slow  # certification lane (pytest.ini)

REG = build_registry()

EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, "
    "event_type string"
)
LI_SCHEMA = (
    "l_orderkey long, l_linenumber int, l_returnflag string, "
    "l_quantity double"
)


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1 + (day - 1) // 28, 1 + (day - 1) % 28, hour)


def _h15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _cents(v: float) -> int:
    return math.floor(v * 100 + 0.5)


# ---- agg_trimmed_mean_bucketed ---------------------------------------------


@pytest.mark.parametrize("seed", [131, 132, 133])
def test_trimmed_mean_bucketed_random_replay(spark, tmp_path, seed):
    """Random ties-heavy quantities: the bucketed form must equal
    BOTH the pure-Python sorted-trim mirror and the exact-rank
    registry form."""
    rng = random.Random(seed)
    rows, key = [], 0
    per_flag: dict[str, list[int]] = {}
    for flag in ("A", "N", "R")[: rng.randint(2, 3)]:
        vals = [
            rng.choice([1, 2, 2, 3, 5, 5, 5, 8, 13, 21]) + rng.randint(0, 3)
            for _ in range(rng.randint(5, 60))
        ]
        per_flag[flag] = sorted(v * 100 for v in vals)
        for v in vals:
            key += 1
            rows.append((key, key % 4 + 1, flag, float(v)))
    write_fixture(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    expect = {}
    for flag, cents in per_flag.items():
        n = len(cents)
        k = n * 10 // 100
        kept = cents[k: n - k]
        expect[flag] = (n, len(kept), sum(kept) * 1000 // len(kept))
    got = {
        r.l_returnflag: (r.n_all, r.n_kept, r.trimmed_mean_cents_milli)
        for r in REG["agg_trimmed_mean_bucketed"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    exact = {
        r.l_returnflag: (r.n_all, r.n_kept, r.trimmed_mean_cents_milli)
        for r in REG["agg_trimmed_mean"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect == exact


# ---- stats_delta_method_ratio ----------------------------------------------


@pytest.mark.parametrize("seed", [141, 142])
def test_delta_method_ratio_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, eid = [], 0
    for uid in range(1, rng.randint(8, 25)):
        for _ in range(rng.randint(1, 6)):
            eid += 1
            rows.append(
                (eid, uid, _ts(rng.randint(1, 28)),
                 round(rng.uniform(0, 30), 2), "a")
            )
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    per: dict[int, list[int]] = {}
    for _eid, uid, _t, v, _e in rows:
        per.setdefault(uid, []).append(_cents(v))
    arms: dict[int, list[tuple[int, int]]] = {0: [], 1: []}
    for uid, xs in per.items():
        arms[_h15(f"{uid}|dmr42") % 2].append((sum(xs), len(xs)))
    if not arms[0] or not arms[1]:
        pytest.skip("degenerate draw: an empty arm")
    stats = {}
    for g, units in arms.items():
        n = len(units)
        sx = float(sum(x for x, _ in units))
        sy = float(sum(y for _, y in units))
        sxx = float(sum(x * x for x, _ in units))
        syy = float(sum(y * y for _, y in units))
        sxy = float(sum(x * y for x, y in units))
        r = sx / sy
        d = sxx - 2.0 * r * sxy + r * r * syy
        se2 = d * n / ((n - 1) * sy * sy) if n > 1 and d >= 0 else None
        stats[g] = (n, r, se2)
    (n0, r0, se20), (n1, r1, se21) = stats[0], stats[1]
    [row] = REG["stats_delta_method_ratio"].fn(spark, str(tmp_path)).collect()
    assert (row.n_users_a, row.n_users_b) == (n0, n1)
    assert row.ratio_a_ppm == math.floor(r0 * 1e6 + 0.5)
    assert row.ratio_b_ppm == math.floor(r1 * 1e6 + 0.5)
    if se20 is not None and se21 is not None and se20 + se21 > 0:
        se = math.sqrt(se20 + se21)
        z = (r1 - r0) / se
        assert not row.degenerate
        assert row.se_ppm == math.floor(se * 1e6 + 0.5)
        assert row.z_milli == math.floor(z * 1000 + 0.5)
        assert row.significant == (abs(z) > 1.96)
    else:
        assert row.degenerate
        assert row.se_ppm == 0 and row.z_milli == 0
        assert row.significant is False
        assert row.ci_lo_ppm == row.ci_hi_ppm == row.delta_ppm


# ---- stats_two_proportion_z + stats_srm_check ------------------------------


@pytest.mark.parametrize("seed", [151, 152])
def test_two_proportion_and_srm_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, eid = [], 0
    users = list(range(1, rng.randint(15, 50)))
    conv = {}
    for uid in users:
        conv[uid] = rng.random() < 0.4
        eid += 1
        rows.append((eid, uid, _ts(rng.randint(1, 28)), 1.0, "view"))
        if conv[uid]:
            eid += 1
            rows.append((eid, uid, _ts(rng.randint(1, 28)), 5.0, "purchase"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)

    arms = {0: [], 1: []}
    for uid in users:
        arms[_h15(f"{uid}|2pz42") % 2].append(conv[uid])
    n0, n1 = len(arms[0]), len(arms[1])
    if n0 == 0 or n1 == 0:
        pytest.skip("degenerate draw: an empty arm")
    x0, x1 = sum(arms[0]), sum(arms[1])
    [r] = REG["stats_two_proportion_z"].fn(spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (n0, n1, x0, x1)
    pp = (x0 + x1) / (n0 + n1)
    if 0 < pp < 1:
        se = math.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1))
        z = (x1 / n1 - x0 / n0) / se
        assert not r.degenerate
        assert r.z_milli == math.floor(z * 1000 + 0.5)
    else:
        assert r.degenerate and r.z_milli == 0

    # SRM mirror over the same fixture
    seen: dict[str, dict[int, set]] = {}
    for _eid, uid, _t, _v, t in rows:
        g = _h15(f"{uid}|2pz42") % 2
        seen.setdefault(t, {0: set(), 1: set()})[g].add(uid)
        seen.setdefault("_overall", {0: set(), 1: set()})[g].add(uid)
    expect = {}
    for t, a in seen.items():
        c0, c1 = len(a[0]), len(a[1])
        chi2 = (c0 - c1) ** 2 / (c0 + c1)
        expect[t] = (c0, c1, math.floor(chi2 * 1000 + 0.5), chi2 > 3.841459)
    got = {
        r.event_type: (r.n_arm_a, r.n_arm_b, r.chi2_milli, r.srm_detected)
        for r in REG["stats_srm_check"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


# ---- stats_capture_recapture -----------------------------------------------


@pytest.mark.parametrize("seed", [161, 162])
def test_capture_recapture_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, eid = [], 0
    for _ in range(rng.randint(20, 80)):
        eid += 1
        rows.append(
            (eid, rng.randint(1, 30), _ts(rng.randint(1, 28), rng.randint(0, 23)),
             1.0, "a")
        )
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    us = [
        int(r[2].replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)
        for r in rows
    ]
    mid = (min(us) + max(us)) // 2
    a = {r[1] for r, u in zip(rows, us) if u <= mid}
    b = {r[1] for r, u in zip(rows, us) if u > mid}
    n1, n2, m_both = len(a), len(b), len(a & b)
    true_total = len(a | b)
    est = (n1 + 1) * (n2 + 1) // (m_both + 1) - 1
    [r] = REG["stats_capture_recapture"].fn(spark, str(tmp_path)).collect()
    assert (r.n_first_half, r.n_second_half, r.n_recaptured) == (
        n1, n2, m_both
    )
    assert (r.true_total, r.chapman_est) == (true_total, est)
    assert r.err_ppm == abs(est - true_total) * 1_000_000 // true_total


# ---- stats_holm_bonferroni -------------------------------------------------


@pytest.mark.parametrize("seed", [171, 172])
def test_holm_random_replay(spark, tmp_path, seed):
    from tests.test_round11_random import _p_two, _welch_z

    rng = random.Random(seed)
    types = [f"t{i}" for i in range(rng.randint(3, 6))]
    rows, eid = [], 0
    for t in types:
        shift = rng.choice([0.0, 0.0, rng.uniform(0.5, 40.0)])
        for i in range(rng.randint(8, 40)):
            eid += 1
            day = rng.randint(1, 30)
            v = rng.uniform(1, 10) + (shift if day > 15 else 0.0)
            rows.append((eid, rng.randint(1, 5), _ts(day, i % 24), v, t))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    us = [
        int(r[2].replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)
        for r in rows
    ]
    mid = (min(us) + max(us)) // 2
    zs = {}
    for t in types:
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
            math.floor(ps[t] * 1e6 + 0.5),
            i,
            m,
            math.floor(min(1.0, runmax) * 1e6 + 0.5),
            runmax <= 0.05,
        )
    got = {
        r.event_type: (
            r.z_milli, r.p_ppm, r.p_rank, r.m, r.p_holm_ppm, r.rejected
        )
        for r in REG["stats_holm_bonferroni"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
