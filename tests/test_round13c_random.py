"""Randomized independent-implementation replays for the round-13
batch-53 operators (slow certification lane).
"""

from __future__ import annotations

import math
import random
import re

import pytest

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture
from tests.test_round13c import (
    DOC_SCHEMA,
    EV_SCHEMA,
    LI_SCHEMA,
    _PPM,
    _attr_mirror,
    _daynum,
    _fifo_mirror,
    _hampel_mirror,
    _ts,
)

pytestmark = pytest.mark.slow  # certification lane (pytest.ini)

REG = build_registry()


# ---- orders_fifo_allocation -------------------------------------------------


@pytest.mark.parametrize("seed", [1411, 1412, 1413])
def test_fifo_allocation_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    lines, okey = [], 0
    for part in range(1, rng.randint(3, 7)):
        for _ in range(rng.randint(0, 12)):
            okey += 1
            flag = "N" if rng.random() < 0.6 else "R"
            lines.append(
                (okey, rng.randint(1, 3), part, flag,
                 rng.randint(1, 25), rng.randint(1, 9))
            )
    rows = [(o, l, p, f, _ts(d), float(q)) for o, l, p, f, d, q in lines]
    write_fixture(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    expect = _fifo_mirror(lines)
    got = {
        (r.l_partkey, r.ret_orderkey, r.ret_linenumber, r.rcv_orderkey,
         r.rcv_linenumber): r.matched_qty
        for r in REG["orders_fifo_allocation"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
    # FIFO conservation: matched total == min(supply, demand) per part
    per = {}
    for (p, *_rest), q in got.items():
        per[p] = per.get(p, 0) + q
    for p in {x[2] for x in lines}:
        sup = sum(q for _o, _l, pp, f, _d, q in lines if pp == p and f == "N")
        dem = sum(q for _o, _l, pp, f, _d, q in lines if pp == p and f == "R")
        assert per.get(p, 0) == min(sup, dem)


# ---- window_hampel_outliers ---------------------------------------------------


@pytest.mark.parametrize("seed", [1421, 1422])
def test_hampel_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, eid = [], 0
    series = {}
    for t in ("a", "b"):
        days = sorted(rng.sample(range(1, 29), rng.randint(4, 22)))
        ser = []
        for d in days:
            tot = 0
            for _ in range(rng.randint(1, 3)):
                eid += 1
                # occasional spikes so flags actually fire
                v = rng.uniform(1, 20) * (50 if rng.random() < 0.1 else 1)
                tot += math.floor(v * 100 + 0.5)
                rows.append((eid, rng.randint(1, 4), _ts(d), v, t))
            ser.append((_daynum(_ts(d)), tot))
        series[t] = ser
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        (r.event_type, r.day): (r.n_window, r.med_x2, r.mad_x2, r.is_outlier)
        for r in REG["window_hampel_outliers"].fn(spark, str(tmp_path)).collect()
    }
    expect = {
        (t, d): v
        for t, ser in series.items()
        for d, v in _hampel_mirror(ser).items()
    }
    assert got == expect


# ---- events_attribution_credit ------------------------------------------------


@pytest.mark.parametrize("seed", [1431, 1432, 1433])
def test_attribution_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, eid = [], 0
    for uid in range(1, rng.randint(5, 12)):
        for _ in range(rng.randint(1, 15)):
            eid += 1
            t = rng.choice(["view", "click", "scroll", "purchase"])
            rows.append(
                (eid, uid, _ts(rng.randint(1, 26), rng.randint(0, 23)),
                 1.0, t)
            )
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    expect = _attr_mirror(rows)
    got = {
        r.event_type: (r.n_touches, r.n_conversions, r.credit_ppm_total)
        for r in REG["events_attribution_credit"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


# ---- text_lorenz_curve + text_simpson_diversity -------------------------------


@pytest.mark.parametrize("seed", [1441, 1442])
def test_lorenz_and_simpson_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = []
    for i in range(1, rng.randint(8, 40)):
        src = rng.choice(["web", "news"])
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        docs.append((i, text, "en", src, rng.randint(0, 500)))
    write_fixture(spark, tmp_path, "documents", docs, DOC_SCHEMA)

    # Lorenz mirror
    by_src: dict[str, list] = {}
    for doc_id, _t, _l, src, w in docs:
        by_src.setdefault(src, []).append((w, doc_id))
    expect_l = {}
    for src, items in by_src.items():
        items.sort()
        n, tot = len(items), sum(w for w, _ in items)
        cum, cums = 0, []
        for w, _ in items:
            cum += w
            cums.append(cum)
        for p in range(10, 101, 10):
            k = n * p // 100
            expect_l[(src, p)] = (k, cums[k - 1] * _PPM // tot if k else 0)
    got_l = {
        (r.source, r.p_pct): (r.k_docs, r.lorenz_ppm)
        for r in REG["text_lorenz_curve"].fn(spark, str(tmp_path)).collect()
    }
    assert got_l == expect_l

    # Simpson mirror
    expect_s = {}
    for src in by_src:
        counts: dict[str, int] = {}
        for _d, text, _l, s, _w in docs:
            if s != src:
                continue
            for w in re.findall(r"[a-z]+", text.lower()):
                counts[w] = counts.get(w, 0) + 1
        n = sum(counts.values())
        if n >= 2:
            num = sum(c * (c - 1) for c in counts.values())
            expect_s[src] = (len(counts), n, num * _PPM // (n * (n - 1)))
    got_s = {
        r.source: (r.vocab, r.n_tokens, r.simpson_ppm)
        for r in REG["text_simpson_diversity"].fn(spark, str(tmp_path)).collect()
    }
    assert got_s == expect_s


# ---- events_best_split_sse ----------------------------------------------------


@pytest.mark.parametrize("seed", [1451, 1452, 1453])
def test_best_split_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, eid = [], 0
    per_type: dict[str, dict[int, int]] = {}
    for t in ("a", "b", "c")[: rng.randint(1, 3)]:
        days = sorted(rng.sample(range(1, 29), rng.randint(1, 15)))
        shift_at = rng.randint(0, len(days))
        for j, d in enumerate(days):
            c = rng.randint(1, 4) + (7 if j >= shift_at else 0)
            per_type.setdefault(t, {})[_daynum(_ts(d))] = c
            for _ in range(c):
                eid += 1
                rows.append((eid, rng.randint(1, 5), _ts(d), 1.0, t))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    expect = {}
    for t, dc in per_type.items():
        days = sorted(dc)
        cs = [dc[d] for d in days]
        n = len(cs)
        if n < 2:
            continue
        t1, t2 = sum(cs), sum(c * c for c in cs)
        best = None
        for i in range(1, n):
            s1 = sum(cs[:i])
            s2 = sum(c * c for c in cs[:i])
            sse = (s2 - s1 * s1 / i) + (
                (t2 - s2) - (t1 - s1) * (t1 - s1) / (n - i)
            )
            key = (sse, days[i - 1])
            if best is None or key < best:
                best = key
        expect[t] = (
            days[[d for d in days].index(best[1])],
            n,
            math.floor((t2 - t1 * t1 / n) * 1000 + 0.5),
            math.floor(best[0] * 1000 + 0.5),
        )
    got = {
        r.event_type: (r.split_day, r.n_days, r.sse_total_milli,
                       r.sse_split_milli)
        for r in REG["events_best_split_sse"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


# ---- events_type_user_jaccard -------------------------------------------------


@pytest.mark.parametrize("seed", [1461, 1462])
def test_type_jaccard_random_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, eid = [], 0
    members: dict[str, set] = {}
    for t in ("view", "click", "buy", "refund")[: rng.randint(2, 4)]:
        for u in rng.sample(range(1, 30), rng.randint(1, 20)):
            eid += 1
            rows.append((eid, u, _ts(1 + eid % 25), 1.0, t))
            members.setdefault(t, set()).add(u)
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    expect = {}
    ts = sorted(members)
    for i, ta in enumerate(ts):
        for tb in ts[i + 1 :]:
            co = len(members[ta] & members[tb])
            if co >= 1:
                na, nb = len(members[ta]), len(members[tb])
                expect[(ta, tb)] = (
                    co, na, nb, co * _PPM // (na + nb - co)
                )
    got = {
        (r.ta, r.tb): (r.n_shared, r.n_a, r.n_b, r.jaccard_ppm)
        for r in REG["events_type_user_jaccard"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


# ---- stats_psi_drift ----------------------------------------------------------


@pytest.mark.parametrize("seed", [1471, 1472, 1473])
def test_psi_drift_random_replay(spark, tmp_path, seed):
    from tests.test_round13c import _psi_mirror

    rng = random.Random(seed)
    rows, eid = [], 0
    for t in ("a", "b", "c")[: rng.randint(1, 3)]:
        drift = rng.random() < 0.5
        for _ in range(rng.randint(3, 60)):
            eid += 1
            d = rng.randint(1, 28)
            v = rng.uniform(0.5, 8)
            if drift and d > 14:
                v += rng.uniform(0, 10)  # post-half shift
            rows.append((eid, rng.randint(1, 5), _ts(d, rng.randint(0, 23)), v, t))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    expect = _psi_mirror(rows)
    got = {
        r.event_type: (r.n_pre, r.n_post, r.n_bins, r.psi, r.band)
        for r in REG["stats_psi_drift"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(expect)
    for t in got:
        assert got[t][:3] == expect[t][:3]
        assert abs(got[t][3] - expect[t][3]) <= 2e-6
        assert got[t][4] == expect[t][4]
