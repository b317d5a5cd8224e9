"""Round-12 planted tests: the basket-lift pair-build cap (brief #5)
and its data-model bound.

The uncapped pair build is quadratic in basket size by construction
(warehouse30.q_orders_basket_lift builds k*(k-1)/2 structs INSIDE one
row before explode), so a pathological million-item basket would
materialize ~5e11 in-row structs.  _BASKET_MAX_PARTS pins the sorted
prefix that enters the pair build; these tests prove (a) the cap
binds correctly and both engines agree when it does, and (b) the cap
never binds at the TPC-H data shape the registry runs on.
"""

from __future__ import annotations

import pytest

from rc_scanner_spark.queries import build_registry
from rc_scanner_spark.queries.warehouse30 import _BASKET_MAX_PARTS

from tests.conftest import write_fixture

REG = build_registry()

LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_returnflag string, "
    "l_quantity double, l_shipdate timestamp"
)
_TS = __import__("datetime").datetime(2024, 1, 1)


def _mirror(baskets: dict[int, set[int]]) -> dict:
    """Pure-Python basket-lift mirror WITH the sorted-prefix cap."""
    N = len(baskets)
    part_n: dict[int, int] = {}
    pair_n: dict[tuple[int, int], int] = {}
    for parts in baskets.values():
        for p in parts:  # part_n is UNCAPPED (matches both engines)
            part_n[p] = part_n.get(p, 0) + 1
        sp = sorted(parts)[:_BASKET_MAX_PARTS]
        for i, a in enumerate(sp):
            for b in sp[i + 1:]:
                pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    out = {}
    for (a, b), n in pair_n.items():
        if n < 2:
            continue
        out[(a, b)] = (
            n,
            part_n[a],
            part_n[b],
            n * 1_000_000 // part_n[a],
            n * N * 1_000_000 // (part_n[a] * part_n[b]),
        )
    return out


@pytest.mark.slow
def test_basket_lift_cap_binds_on_pathological_basket(spark, tmp_path):
    """A 400-distinct-part basket (cap 256 binds): pairs exist only
    among the first 256 sorted parts, part_n stays uncapped, and the
    Spark result matches the capped pure-Python mirror exactly."""
    k = _BASKET_MAX_PARTS + 144  # 400 distinct parts
    big = set(range(1000, 1000 + k))
    # two identical pathological baskets so surviving pairs hit the
    # n_pair >= 2 support floor; one small disjoint basket as control
    baskets = {1: big, 2: big, 3: {50, 60}, 4: {50, 60}}
    rows = []
    for ok, parts in baskets.items():
        for pk in sorted(parts):
            rows.append((ok, pk, 1, "N", 1.0, _TS))
    write_fixture(spark, tmp_path, "lineitem", rows, LI_SCHEMA)

    got = {
        (r.part_a, r.part_b): (
            r.n_pair, r.n_a, r.n_b, r.conf_a_to_b_ppm, r.lift_ppm
        )
        for r in REG["orders_basket_lift"].fn(spark, str(tmp_path)).collect()
    }
    expect = _mirror(baskets)
    assert got == expect
    # the cap actually bound: no pair may touch a part beyond the
    # 256-th sorted element of the big basket
    cut = sorted(big)[_BASKET_MAX_PARTS - 1]
    assert all(b <= cut or (a, b) == (50, 60) for a, b in got)
    n_big_pairs = _BASKET_MAX_PARTS * (_BASKET_MAX_PARTS - 1) // 2
    assert len(got) == n_big_pairs + 1  # capped pairs + the control


EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _emb_row(vid, dense):
    v = [0.0] * 64
    for i, x in dense.items():
        v[i] = x
    return (vid, v, 0)


def test_power_iter_portable_exact_diagonal(spark, tmp_path):
    """Known eigenstructure: C = diag(2.0, 0.5, 0, ...) built from
    four planted vectors.  96 power-iteration steps from v0=0.125
    drive the off-dominant component below double precision
    ((1/4)^96 = 2^-192), so top_eig is EXACTLY 2.0, trace 2.5, and
    the explained share floor(2.0/2.5 * 1e6 + 0.5) = 800000."""
    rows = [
        _emb_row(1, {0: 2.0}),
        _emb_row(2, {0: -2.0}),
        _emb_row(3, {1: 1.0}),
        _emb_row(4, {1: -1.0}),
    ]
    write_fixture(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    [r] = (
        REG["embed_power_iter_portable"].fn(spark, str(tmp_path)).collect()
    )
    assert (r.top_eig, r.cov_trace, r.explained_ppm) == (2.0, 2.5, 800000)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [61, 62])
def test_power_iter_random_replay(spark, tmp_path, seed):
    """Randomized pure-Python mirror (sequential sums, no numpy): the
    grid-snapped dominant eigenvalue, trace, and explained share must
    match the Spark/Arrow implementation exactly — the iteration is
    self-correcting, so independent accumulation orders agree far
    inside the 1e-6 grid."""
    import math
    import random

    rng = random.Random(seed)
    n = rng.randint(20, 50)
    rows = []
    vecs = []
    for vid in range(1, n + 1):
        v = [round(rng.uniform(-1, 1), 3) for _ in range(64)]
        vecs.append(v)
        rows.append((vid, v, 0))
    write_fixture(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)

    # pure-python covariance (float32 inputs widen exactly to double)
    d = 64
    fv = [[float(__import__("numpy").float32(x)) for x in v] for v in vecs]
    C = [[0.0] * d for _ in range(d)]
    mean = [sum(v[i] for v in fv) / n for i in range(d)]
    for i in range(d):
        for j in range(d):
            C[i][j] = (
                sum(v[i] * v[j] for v in fv) / n - mean[i] * mean[j]
            )
    v = [0.125] * d
    for _ in range(96):
        w = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        nrm = math.sqrt(sum(x * x for x in w))
        v = [x / nrm for x in w]
    cv = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
    lam = sum(v[i] * cv[i] for i in range(d))
    trace = sum(C[i][i] for i in range(d))
    eig_g = math.floor(lam * 1e6 + 0.5) / 1e6
    tr_g = math.floor(trace * 1e6 + 0.5) / 1e6
    [r] = (
        REG["embed_power_iter_portable"].fn(spark, str(tmp_path)).collect()
    )
    assert (r.top_eig, r.cov_trace, r.explained_ppm) == (
        eig_g,
        tr_g,
        math.floor(eig_g / tr_g * 1e6 + 0.5),
    )


import datetime as _dt
import hashlib
import math

EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, "
    "event_type string"
)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
ORD_SCHEMA = "o_orderkey long, o_custkey long, o_orderdate timestamp"


def _ts(day: int, hour: int = 0, minute: int = 0):
    return _dt.datetime(2024, 1 + (day - 1) // 28, 1 + (day - 1) % 28, hour, minute)


def _h15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---- stats_kendall_tau ------------------------------------------------


def test_kendall_tau_planted(spark, tmp_path):
    """Hand-computed tau-b: type 'a' has 4 days with x=[1,2,3,4] (one
    event per extra row) and y chosen so exactly one pair is
    discordant -> tau = (5-1)/6 = 0.6667 -> 667 milli.  Type 'b' has
    identical (x, y) on both days (all pairs tied) -> NULL."""
    rows, eid = [], 0
    # day d gets d events of value v so (x, y) = (d, 100*d*v cents)
    day_vals = {1: 10.0, 2: 10.0, 3: 5.0, 4: 10.0}
    # x = [1,2,3,4]; y = [1000, 2000, 1500, 4000] cents
    for d, v in day_vals.items():
        for _ in range(d):
            eid += 1
            rows.append((eid, 1, _ts(d), v, "a"))
    for d in (1, 2):
        eid += 1
        rows.append((eid, 1, _ts(d), 7.0, "b"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r.event_type: (r.n_days, r.concordant, r.discordant, r.tau_milli)
        for r in REG["stats_kendall_tau"].fn(spark, str(tmp_path)).collect()
    }
    assert got["a"] == (4, 5, 1, math.floor(4 / math.sqrt(36.0) * 1000 + 0.5))
    assert got["a"][3] == 667
    assert got["b"] == (2, 0, 0, None)


# ---- events_lateness_profile ------------------------------------------


def test_lateness_profile_planted_replay(spark, tmp_path):
    """Deterministic md5-jitter mirror: replay the arrival simulation
    in pure Python (same 15-hex md5 delay, same per-user arrival sort)
    and assert the bucket histogram matches exactly."""
    rows = []
    for eid in range(1, 13):
        # event times ~20 min apart (total spread > the 2 h jitter) so
        # the jitter actually reorders arrivals within each user AND
        # the resulting lateness spans multiple 10-min buckets
        rows.append((eid, eid % 3, _ts(1, eid // 3, (eid * 17) % 60), 1.0, "a"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)

    jit = 2 * 3_600_000_000
    by_user: dict[int, list] = {}
    for eid, uid, ts, _v, _t in rows:
        us = int(ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)
        arr = us + _h15(f"{eid}|net42") % jit
        by_user.setdefault(uid, []).append((arr, eid, us))
    hist: dict[int, int] = {}
    for lst in by_user.values():
        mx = None
        for arr, eid, us in sorted(lst):
            mx = us if mx is None else max(mx, us)
            b = (mx - us) // 600_000_000
            hist[b] = hist.get(b, 0) + 1
    total = sum(hist.values())
    expect = {
        b: (n, n * 1_000_000 // total) for b, n in hist.items()
    }
    got = {
        r.late_10min: (r.n_events, r.share_ppm)
        for r in REG["events_lateness_profile"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
    assert len(got) > 1  # the jitter actually spread the buckets


# ---- window_cume_dist --------------------------------------------------


def test_cume_dist_planted(spark, tmp_path):
    """Days with counts [1, 1, 2]: both 1-count days share cume 2/3
    (ties take the highest position), the 2-count day gets 1.0."""
    rows, eid = [], 0
    for d, k in ((1, 1), (2, 1), (3, 2)):
        for _ in range(k):
            eid += 1
            rows.append((eid, 1, _ts(d), 1.0, "a"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r.day: r.cume_ppm
        for r in REG["window_cume_dist"].fn(spark, str(tmp_path)).collect()
    }
    days = sorted(got)
    assert got[days[0]] == got[days[1]] == math.floor(2 / 3 * 1e6 + 0.5)
    assert got[days[2]] == 1_000_000


# ---- dedup_threshold_sweep ----------------------------------------------


def test_threshold_sweep_planted(spark, tmp_path):
    """One exact-twin pair (jaccard 1.0, survives every threshold) and
    one half-overlap pair (jaccard ~0.5): the sweep counts 2 pairs at
    <= 500 milli and 1 pair above."""
    t1 = "alpha beta gamma delta epsilon zeta"
    # shares shingles 'alpha beta gamma', 'beta gamma delta' with t1
    t2 = "alpha beta gamma delta theta iota"
    rows = [
        (1, t1, "en", "s", len(t1)),
        (2, t1, "en", "s", len(t1)),
        (3, t2, "en", "s", len(t2)),
        (4, "unrelated words entirely different tokens here", "en", "s", 46),
    ]
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = {
        r.threshold_milli: (r.n_pairs, r.n_docs)
        for r in REG["dedup_threshold_sweep"].fn(spark, str(tmp_path)).collect()
    }
    # jaccard(1,2) = 1.0; jaccard(1,3) = jaccard(2,3) = 2/6 = 0.3333
    assert got[300] == (3, 3)
    assert got[400] == (1, 2)
    assert got[900] == (1, 2)


# ---- dedup_quality_shift -------------------------------------------------


def test_quality_shift_planted(spark, tmp_path):
    """Source 's' holds an exact dup pair (after whitespace
    normalization) plus one unique doc: 3 -> 2 docs, removed 1/3."""
    rows = [
        (1, "spark  rows", "en", "s", 100),
        (2, "spark rows", "en", "s", 300),  # same fp as doc 1
        (3, "other text", "en", "s", 200),
        (4, "solo", "en", "t", 50),
    ]
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = {
        r.source: (
            r.n_all,
            r.n_surv,
            r.mean_chars_all_milli,
            r.mean_chars_surv_milli,
            r.removed_ppm,
        )
        for r in REG["dedup_quality_shift"].fn(spark, str(tmp_path)).collect()
    }
    assert got["s"] == (3, 2, 200000, 150000, 333333)
    assert got["t"] == (1, 1, 50000, 50000, 0)


# ---- text_garbage_score ---------------------------------------------------


def test_garbage_score_planted(spark, tmp_path):
    """Hand-computed ratios: symbols, digits, consonant runs, and the
    empty doc yielding NULL ppm shares on both engines."""
    rows = [
        (1, "ab#$%xyzzz", "en", "s", 10),   # 3 symbols / 10
        (2, "a1234bcdfg", "en", "s", 10),   # 4 digits, run 'bcdfg'=5
        (3, "", "en", "s", 0),
        (4, "#########!", "en", "s", 10),   # all symbols -> garbage
    ]
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = {
        r.doc_id: (
            r.n_chars_raw,
            r.symbol_ppm,
            r.digit_ppm,
            r.max_consonant_run,
            r.is_garbage,
        )
        for r in REG["text_garbage_score"].fn(spark, str(tmp_path)).collect()
    }
    assert got[1] == (10, 300000, 0, 5, True)  # run 'xyzzz' (y counts)
    assert got[2] == (10, 0, 400000, 5, False)
    assert got[3] == (0, None, None, 0, None)
    assert got[4] == (10, 1000000, 0, 0, True)


# ---- stats_permutation_test -----------------------------------------------


def test_permutation_test_planted_replay(spark, tmp_path):
    """Deterministic md5 mirror of the full randomization test: arms,
    the 200 re-draws (each reassigning WHOLE USERS — the assignment
    unit, per the r12 advice), the extreme count, and p — all
    replayed in pure Python and compared exactly."""
    rows = []
    for eid in range(1, 41):
        rows.append((eid, eid % 7, _ts(1 + eid % 5), float(eid % 9) + 0.25, "a"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)

    def cents(v):
        return math.floor(v * 100 + 0.5)

    arms: dict[int, list[int]] = {0: [], 1: []}
    for eid, uid, _ts_, v, _t in rows:
        arms[_h15(f"{uid}|perm42") % 2].append(cents(v))
    obs = abs(
        sum(arms[0]) / len(arms[0]) - sum(arms[1]) / len(arms[1])
    )
    n_extreme = 0
    for b in range(1, 201):
        g: dict[int, list[int]] = {0: [], 1: []}
        for eid, uid, _ts_, v, _t in rows:
            g[_h15(f"{uid}|{b}|perm42") % 2].append(cents(v))
        if not g[0] or not g[1]:
            continue  # NULL diff on both engines, never extreme
        d = abs(sum(g[0]) / len(g[0]) - sum(g[1]) / len(g[1]))
        if d >= obs:
            n_extreme += 1
    [r] = REG["stats_permutation_test"].fn(spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b) == (len(arms[0]), len(arms[1]))
    assert r.obs_diff_milli == math.floor(obs * 1000 + 0.5)
    assert r.n_extreme == n_extreme
    assert r.p_ppm == math.floor((n_extreme + 1) / 201 * 1e6 + 0.5)


# ---- orders_next_order_affinity -------------------------------------------


LI2_SCHEMA = "l_orderkey long, l_partkey long"


def test_next_order_affinity_planted(spark, tmp_path):
    """Two customers with the same two-order sequence {1,2} -> {2,3}:
    every directional pair fires twice, so all survive the n >= 2
    floor; confidences follow the prev-occurrence counts."""
    orders = [
        (1, 1, _ts(1)), (2, 1, _ts(2)),
        (3, 2, _ts(1)), (4, 2, _ts(2)),
    ]
    li = [
        (1, 10), (1, 20), (2, 20), (2, 30),
        (3, 10), (3, 20), (4, 20), (4, 30),
    ]
    write_fixture(spark, tmp_path, "orders", orders, ORD_SCHEMA)
    write_fixture(spark, tmp_path, "lineitem", li, LI2_SCHEMA)
    got = {
        (r.part_prev, r.part_next): (r.n_pair, r.n_prev, r.conf_ppm)
        for r in REG["orders_next_order_affinity"].fn(spark, str(tmp_path)).collect()
    }
    # transitions per customer: prev {10,20} -> next {20,30}
    # pairs each transition: (10,20) (10,30) (20,20) (20,30); 2 customers
    assert got[(10, 20)] == (2, 2, 1_000_000)
    assert got[(10, 30)] == (2, 2, 1_000_000)
    assert got[(20, 20)] == (2, 2, 1_000_000)
    assert got[(20, 30)] == (2, 2, 1_000_000)
    assert len(got) == 4


# ---- sample_snis_clipped ---------------------------------------------------


def test_snis_clipped_planted(spark, tmp_path):
    """Two sources (1 and 3 docs): w_a = 4/(2*1) = 2.0, w_b = 4/6;
    the estimate and Kish ESS replayed with the identical left fold."""
    rows = [
        (1, "a", "en", "sa", 100),
        (2, "b", "en", "sb", 200),
        (3, "c", "en", "sb", 200),
        (4, "d", "en", "sb", 200),
    ]
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    w_a = min(4.0 / (2.0 * 1.0), 5.0)
    w_b = min(4.0 / (2.0 * 3.0), 5.0)
    sum_ws = 0.0
    sum_wn = 0.0
    sum_wwn = 0.0
    for w, chars, n in ((w_a, 100.0, 1.0), (w_b, 600.0, 3.0)):  # sa < sb
        sum_ws += w * chars
        sum_wn += w * n
        sum_wwn += w * w * n
    [r] = REG["sample_snis_clipped"].fn(spark, str(tmp_path)).collect()
    assert r.n_docs == 4
    assert r.snis_mean_chars_milli == math.floor(sum_ws / sum_wn * 1000 + 0.5)
    assert r.ess_ppm == math.floor(
        sum_wn * sum_wn / sum_wwn / 4.0 * 1e6 + 0.5
    )


def test_basket_cap_never_binds_at_registry_shape(spark):
    """The documented data-model bound: the synthetic generator is
    looser than strict TPC-H (measured max distinct parts/order: 7 at
    sf0.001, 13 at sf0.01, 17 at sf0.1 — growing ~log with SF), but
    every scale the registry runs on sits far under _BASKET_MAX_PARTS,
    so the cap is a pure safety rail for the registry's own data."""
    from pyspark.sql import functions as F

    from rc_scanner_spark.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    mx = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_partkey").alias("k"))
        .agg(F.max("k").alias("mx"))
        .collect()[0]["mx"]
    )
    assert mx < _BASKET_MAX_PARTS // 4, mx


# ---- randomized slow-lane replays (round-12 batch 48) -----------------


@pytest.mark.slow
@pytest.mark.parametrize("seed", [71, 72])
def test_kendall_tau_random_replay(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    rows, eid = [], 0
    daily: dict[str, dict[int, list[int]]] = {}
    for t in ("a", "b", "c"):
        for d in range(1, rng.randint(5, 15)):
            k = rng.randint(1, 4)
            for _ in range(k):
                eid += 1
                v = rng.choice([1.0, 2.5, 2.5, 7.75])
                rows.append((eid, 1, _ts(d), v, t))
                daily.setdefault(t, {}).setdefault(d, []).append(
                    math.floor(v * 100 + 0.5)
                )
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)

    expect = {}
    for t, days in daily.items():
        pts = sorted(
            (d, len(vs), sum(vs)) for d, vs in days.items()
        )
        c = d_ = n1 = n2 = n0 = 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                n0 += 1
                sx = pts[i][1] - pts[j][1]
                sy = pts[i][2] - pts[j][2]
                if sx * sy > 0:
                    c += 1
                elif sx * sy < 0:
                    d_ += 1
                if sx == 0:
                    n1 += 1
                if sy == 0:
                    n2 += 1
        dx, dy = float(n0 - n1), float(n0 - n2)
        tau = (
            math.floor((c - d_) / math.sqrt(dx * dy) * 1000 + 0.5)
            if dx > 0 and dy > 0
            else None
        )
        expect[t] = (len(pts), c, d_, tau)
    got = {
        r.event_type: (r.n_days, r.concordant, r.discordant, r.tau_milli)
        for r in REG["stats_kendall_tau"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


@pytest.mark.slow
@pytest.mark.parametrize("seed", [73, 74])
def test_permutation_test_random_replay(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    rows = []
    for eid in range(1, rng.randint(30, 80)):
        rows.append(
            (eid, rng.randint(1, 9), _ts(rng.randint(1, 10)),
             round(rng.uniform(0, 20), 2), "a")
        )
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)

    def cents(v):
        return math.floor(v * 100 + 0.5)

    arms: dict[int, list[int]] = {0: [], 1: []}
    for eid, uid, _t_, v, _e in rows:
        arms[_h15(f"{uid}|perm42") % 2].append(cents(v))
    obs = abs(sum(arms[0]) / len(arms[0]) - sum(arms[1]) / len(arms[1]))
    n_extreme = 0
    for b in range(1, 201):
        g: dict[int, list[int]] = {0: [], 1: []}
        for eid, uid, _t_, v, _e in rows:
            g[_h15(f"{uid}|{b}|perm42") % 2].append(cents(v))
        if not g[0] or not g[1]:
            continue
        if abs(sum(g[0]) / len(g[0]) - sum(g[1]) / len(g[1])) >= obs:
            n_extreme += 1
    [r] = REG["stats_permutation_test"].fn(spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b, r.n_extreme) == (
        len(arms[0]), len(arms[1]), n_extreme
    )
    assert r.p_ppm == math.floor((n_extreme + 1) / 201 * 1e6 + 0.5)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [75, 76])
def test_next_order_affinity_random_replay(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    orders, li = [], []
    cust_orders: dict[int, list] = {}
    ok = 0
    for cust in range(1, rng.randint(4, 9)):
        for _ in range(rng.randint(1, 5)):
            ok += 1
            day = rng.randint(1, 28)
            parts = sorted(rng.sample(range(10, 25), rng.randint(1, 5)))
            orders.append((ok, cust, _ts(day)))
            for p in parts:
                li.append((ok, p))
            cust_orders.setdefault(cust, []).append((day, ok, parts))
    write_fixture(spark, tmp_path, "orders", orders, ORD_SCHEMA)
    write_fixture(spark, tmp_path, "lineitem", li, LI2_SCHEMA)

    n_prev: dict[int, int] = {}
    pair_n: dict[tuple[int, int], int] = {}
    for seq in cust_orders.values():
        seq.sort()
        for (d1, k1, prev), (d2, k2, nxt) in zip(seq, seq[1:]):
            for pa in prev:
                n_prev[pa] = n_prev.get(pa, 0) + 1
                for pb in nxt:
                    pair_n[(pa, pb)] = pair_n.get((pa, pb), 0) + 1
    expect = {
        (pa, pb): (n, n_prev[pa], n * 1_000_000 // n_prev[pa])
        for (pa, pb), n in pair_n.items()
        if n >= 2
    }
    got = {
        (r.part_prev, r.part_next): (r.n_pair, r.n_prev, r.conf_ppm)
        for r in REG["orders_next_order_affinity"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == expect


@pytest.mark.slow
@pytest.mark.parametrize("seed", [77, 78])
def test_garbage_score_random_replay(spark, tmp_path, seed):
    import random
    import re

    rng = random.Random(seed)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 #$%!@"
    rows = []
    for did in range(1, rng.randint(20, 50)):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        rows.append((did, s, "en", "s", len(s)))
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)

    expect = {}
    for did, s, _l, _src, _n in rows:
        lo = s.lower()
        n = len(lo)
        sym = n - len(re.sub(r"[^a-z0-9 ]", "", lo))
        dig = n - len(re.sub(r"[0-9]", "", lo))
        runs = [len(m) for m in re.findall(r"[bcdfghjklmnpqrstvwxyz]+", lo)]
        mr = max(runs) if runs else 0
        if n > 0:
            sp = sym * 1_000_000 // n
            dp = dig * 1_000_000 // n
            garb = sp > 200_000 or mr > 7
        else:
            # empty doc: NULL shares; NULL OR false stays NULL (and
            # mr is always 0 here, so the run clause never fires)
            sp = dp = garb = None
        expect[did] = (n, sp, dp, mr, garb)
    got = {
        r.doc_id: (
            r.n_chars_raw, r.symbol_ppm, r.digit_ppm,
            r.max_consonant_run, r.is_garbage,
        )
        for r in REG["text_garbage_score"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect


@pytest.mark.slow
@pytest.mark.parametrize("seed", [79, 80])
def test_snis_clipped_random_replay(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    rows, did = [], 0
    per: dict[str, list[int]] = {}
    for s in range(rng.randint(2, 7)):
        src = f"s{s:02d}"
        for _ in range(rng.randint(1, 30)):
            did += 1
            nch = rng.randint(10, 999)
            rows.append((did, "t", "en", src, nch))
            per.setdefault(src, []).append(nch)
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)

    N = float(did)
    k = float(len(per))
    sum_ws = sum_wn = sum_wwn = 0.0
    for src in sorted(per):  # the left fold is source-sorted
        n_s = float(len(per[src]))
        w = min(N / (k * n_s), 5.0)
        sum_ws += w * float(sum(per[src]))
        sum_wn += w * n_s
        sum_wwn += w * w * n_s
    [r] = REG["sample_snis_clipped"].fn(spark, str(tmp_path)).collect()
    assert r.n_docs == did
    assert r.snis_mean_chars_milli == math.floor(
        sum_ws / sum_wn * 1000 + 0.5
    )
    assert r.ess_ppm == math.floor(sum_wn * sum_wn / sum_wwn / N * 1e6 + 0.5)


# ---- batch 49: planted tests -------------------------------------------


def test_kmv_set_ops_planted_exact_regime(spark, tmp_path):
    """Fewer than k=64 distinct users per side: every estimate
    collapses to the exact count (n_kept < k path), so union /
    intersection / Jaccard are verifiable by hand.  Users 1-10 in the
    first half, 6-15 in the second -> intersect 5, union 15."""
    rows, eid = [], 0
    for uid in range(1, 11):
        eid += 1
        rows.append((eid, uid, _ts(1), 1.0, "a"))
    for uid in range(6, 16):
        eid += 1
        rows.append((eid, uid, _ts(28), 1.0, "a"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["sketch_kmv_set_ops"].fn(spark, str(tmp_path)).collect()
    assert (r.exact_a, r.exact_b, r.exact_union, r.exact_intersect) == (
        10, 10, 15, 5
    )
    assert (r.est_union, r.est_intersect) == (15, 5)
    assert r.est_jaccard_ppm == math.floor(5.0 / 15.0 * 1e6 + 0.5)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [81, 82])
def test_kmv_set_ops_random_replay(spark, tmp_path, seed):
    """> 64 users per side so the (k-1)*M/h_k estimator actually
    fires; the pure-Python mirror replays hashes and estimates."""
    import random

    rng = random.Random(seed)
    rows, eid = [], 0
    a_users = set(rng.sample(range(1, 500), rng.randint(80, 200)))
    b_users = set(rng.sample(range(1, 500), rng.randint(80, 200)))
    for uid in sorted(a_users):
        eid += 1
        rows.append((eid, uid, _ts(1), 1.0, "a"))
    for uid in sorted(b_users):
        eid += 1
        rows.append((eid, uid, _ts(28), 1.0, "a"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)

    K, M = 64, float(16**15)

    def est(users):
        hs = sorted(_h15(f"{u}|kmvset") for u in users)
        if len(hs) < K:
            return float(len(hs))
        return (K - 1) * (M / hs[K - 1])

    ea, eb = est(a_users), est(b_users)
    eu = est(a_users | b_users)
    ei = max(ea + eb - eu, 0.0)
    [r] = REG["sketch_kmv_set_ops"].fn(spark, str(tmp_path)).collect()
    assert (r.exact_a, r.exact_b) == (len(a_users), len(b_users))
    assert r.exact_union == len(a_users | b_users)
    assert r.est_union == math.floor(eu)
    assert r.est_intersect == math.floor(ei)
    assert r.est_jaccard_ppm == math.floor(ei / eu * 1e6 + 0.5)


def test_cochran_q_planted(spark, tmp_path):
    """3 users x 3 types, hand-computed: x = [[1,1,0],[1,0,0],[1,1,1]]
    -> C = (3,2,1), T = 6, Ri = (2,1,3), sum Cj^2 = 14, sum Ri^2 = 14;
    Q = 2*(3*14 - 36) / (3*6 - 14) = 12/4 = 3.0."""
    rows, eid = [], 0
    panel = {1: ("a", "b"), 2: ("a",), 3: ("a", "b", "c")}
    for uid, types in panel.items():
        for t in types:
            eid += 1
            rows.append((eid, uid, _ts(eid), 1.0, t))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_cochran_q"].fn(spark, str(tmp_path)).collect()
    assert (r.n_users, r.k_types, r.df, r.q_milli) == (3, 3, 2, 3000)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [83, 84])
def test_cochran_q_random_replay(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    types = ["a", "b", "c", "d"][: rng.randint(2, 4)]
    rows, eid = [], 0
    panel: dict[int, set[str]] = {}
    for uid in range(1, rng.randint(5, 25)):
        mine = {t for t in types if rng.random() < 0.5}
        if not mine:
            mine = {rng.choice(types)}
        panel[uid] = mine
        for t in mine:
            eid += 1
            rows.append((eid, uid, _ts(1 + eid % 27), 1.0, t))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)

    seen_types = sorted({t for s in panel.values() for t in s})
    k = len(seen_types)
    ri = {u: len(s) for u, s in panel.items()}
    cj = {t: sum(1 for s in panel.values() if t in s) for t in seen_types}
    T = sum(ri.values())
    num = (k - 1) * (k * sum(c * c for c in cj.values()) - T * T)
    den = k * T - sum(r * r for r in ri.values())
    q = math.floor(num / den * 1000 + 0.5) if den > 0 else None
    [r] = REG["stats_cochran_q"].fn(spark, str(tmp_path)).collect()
    assert (r.n_users, r.k_types, r.df, r.q_milli) == (
        len(panel), k, k - 1, q
    )


LI3_SCHEMA = (
    "l_orderkey long, l_partkey long, l_linenumber long, "
    "l_returnflag string, l_quantity double"
)


def test_trimmed_mean_planted(spark, tmp_path):
    """10 values 1..10 (cents 100..1000): lo = 1, keep ranks 2..9 ->
    mean of 200..900 cents = 550 cents -> 550000 milli."""
    rows = [
        (i, 1, i, "N", float(i)) for i in range(1, 11)
    ]
    write_fixture(spark, tmp_path, "lineitem", rows, LI3_SCHEMA)
    [r] = REG["agg_trimmed_mean"].fn(spark, str(tmp_path)).collect()
    assert (r.l_returnflag, r.n_all, r.n_kept) == ("N", 10, 8)
    assert r.trimmed_mean_cents_milli == 550000


def test_lsh_band_tuning_planted(spark, tmp_path):
    """Reuses the sweep fixture: one exact pair (s = 1.0, p = 1 for
    every config) and two partial pairs (s = 0.3333); expected ppm
    sums replayed with the identical square-multiply chains."""
    t1 = "alpha beta gamma delta epsilon zeta"
    t2 = "alpha beta gamma delta theta iota"
    rows = [
        (1, t1, "en", "s", len(t1)),
        (2, t1, "en", "s", len(t1)),
        (3, t2, "en", "s", len(t2)),
    ]
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)

    def p_of(s, r, b):
        sr = s * s
        if r >= 4:
            sr = sr * sr
        if r == 8:
            sr = sr * sr
        x = 1.0 - sr
        xb = x * x
        if b >= 4:
            xb = xb * xb
        if b == 8:
            xb = xb * xb
        return 1.0 - xb

    svals = [1.0, 0.3333, 0.3333]
    got = {
        (r.bands, r.rows): (
            r.n_pairs, r.exp_detected_milli, r.exp_detected_neardup_milli
        )
        for r in REG["dedup_lsh_band_tuning"].fn(spark, str(tmp_path)).collect()
    }
    for b, rr in ((2, 8), (4, 4), (8, 2)):
        tot = sum(math.floor(p_of(s, rr, b) * 1e6 + 0.5) for s in svals)
        near = sum(
            math.floor(p_of(s, rr, b) * 1e6 + 0.5) for s in svals if s >= 0.5
        )
        assert got[(b, rr)] == (3, tot // 1000, near // 1000)


def test_cluster_purity_planted(spark, tmp_path):
    """One 2-doc cluster split across sources (purity 500000) and one
    3-doc cluster with a 2/1 source split (purity 666666); singleton
    docs are excluded."""
    pre = "shared four word prefix"
    pre2 = "another common head run"
    rows = [
        (1, pre + " tail one", "en", "sa", 20),
        (2, pre + " tail two", "en", "sb", 20),
        (3, pre2 + " xx", "en", "sa", 20),
        (4, pre2 + " yy", "en", "sa", 20),
        (5, pre2 + " zz", "en", "sb", 20),
        (6, "completely unrelated solitary document", "en", "sa", 30),
    ]
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = {
        r.cluster_size: (r.n_clusters, r.mean_purity_ppm)
        for r in REG["dedup_cluster_purity"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {2: (1, 500000), 3: (1, 666666)}


def test_page_trend_planted(spark, tmp_path):
    """3 days with event counts strictly rising across the four
    6-hour buckets: doubled ranks (2,4,6,8) per day, L2 = 3*60 = 180,
    E[L2] = 150, Var = 3*1200/36 -> z = 30/sqrt(100) = 3.0."""
    rows, eid = [], 0
    for d in (1, 2, 3):
        for bucket in range(4):
            for _ in range(bucket + 1):  # counts 1,2,3,4
                eid += 1
                rows.append((eid, 1, _ts(d, bucket * 6), 1.0, "a"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_page_trend"].fn(spark, str(tmp_path)).collect()
    assert (r.n_days, r.k_buckets, r.l2, r.e_l2, r.z_milli) == (
        3, 4, 180, 150, 3000
    )


@pytest.mark.slow
@pytest.mark.parametrize("seed", [85, 86])
def test_page_trend_random_replay(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    rows, eid = [], 0
    counts: dict[tuple[int, int], int] = {}
    for d in range(1, rng.randint(4, 10)):
        for bucket in range(4):
            k = rng.randint(0, 4)
            counts[(d, bucket)] = k
            for _ in range(k):
                eid += 1
                rows.append(
                    (eid, 1, _ts(d, bucket * 6, eid % 60), 1.0, "a")
                )
    if not rows:
        rows.append((1, 1, _ts(1, 0), 1.0, "a"))
        counts[(1, 0)] = 1
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)

    # mirror zero-fills only days that HAVE at least one event (the
    # day spine comes from observed events)
    days = sorted({d for (d, _b), n in counts.items() if n > 0})
    l2 = 0
    for j in range(4):
        rsum = 0
        for d in days:
            vals = sorted(counts.get((d, b), 0) for b in range(4))
            v = counts.get((d, j), 0)
            lo = vals.index(v) + 1          # min rank (1-based)
            ties = vals.count(v)
            rsum += 2 * lo + ties - 1
        l2 += (j + 1) * rsum
    b = len(days)
    e_l2 = b * 4 * 25 // 2
    var = b * 16.0 * 5.0 * 15.0 / 36.0
    z = math.floor((l2 - e_l2) / math.sqrt(var) * 1000 + 0.5) if b else None
    [r] = REG["stats_page_trend"].fn(spark, str(tmp_path)).collect()
    assert (r.n_days, r.l2, r.e_l2, r.z_milli) == (b, l2, e_l2, z)


# ---- batch 50: planted tests -------------------------------------------


def test_asof_forward_planted(spark, tmp_path):
    """Purchase at day 5: clicks at days 3 (before, must NOT match)
    and 7/9 (after) -> matches day 7 (earliest after).  A purchase
    with no later click gets a NULL match."""
    rows = [
        (1, 1, _ts(3), 1.0, "click"),
        (2, 1, _ts(5), 1.0, "purchase"),
        (3, 1, _ts(7), 1.0, "click"),
        (4, 1, _ts(9), 1.0, "click"),
        (5, 2, _ts(5), 1.0, "purchase"),
        (6, 2, _ts(4), 1.0, "click"),
    ]
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r.event_id: (r.click_event_id, r.gap_us)
        for r in REG["join_asof_forward"].fn(spark, str(tmp_path)).collect()
    }
    two_days = 2 * 86_400_000_000
    assert got[2] == (3, two_days)
    assert got[5] == (None, None)


def test_asof_forward_tie_breaks_on_smallest_id(spark, tmp_path):
    """Two clicks at the SAME instant after the purchase: the
    operator contract picks the smallest right id."""
    rows = [
        (1, 1, _ts(5), 1.0, "purchase"),
        (3, 1, _ts(6), 1.0, "click"),
        (2, 1, _ts(6), 1.0, "click"),
    ]
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["join_asof_forward"].fn(spark, str(tmp_path)).collect()
    assert r.click_event_id == 2


def test_fill_forward_planted(spark, tmp_path):
    """Views are dropout: [view, purchase(3.0), view, click(5.0),
    view] fills to [NULL, 300, 300, 500, 500]; a leading view stays
    NULL on both engines."""
    rows = [
        (1, 1, _ts(1), 9.0, "view"),      # value ignored for views
        (2, 1, _ts(2), 3.0, "purchase"),
        (3, 1, _ts(3), 9.0, "view"),
        (4, 1, _ts(4), 5.0, "click"),
        (5, 1, _ts(5), 9.0, "view"),
    ]
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = [
        (r.obs_cents, r.filled_cents)
        for r in REG["window_fill_forward"].fn(spark, str(tmp_path)).collect()
    ]
    assert got == [
        (None, None), (300, 300), (None, 300), (500, 500), (None, 500)
    ]


def test_sample_systematic_planted_replay(spark, tmp_path):
    """Pure-Python md5 mirror of the per-source hash order: the
    sampled set is ranks 1, 11, 21... of each source."""
    rows = [
        (i, f"t{i}", "en", f"s{i % 2}", 10) for i in range(1, 31)
    ]
    write_fixture(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    expect = set()
    for src in ("s0", "s1"):
        ids = [i for i in range(1, 31) if f"s{i % 2}" == src]
        order = sorted(
            ids, key=lambda i: (hashlib.md5(f"{i}|sys42".encode()).hexdigest(), i)
        )
        for rk, did in enumerate(order, start=1):
            if rk % 10 == 1:
                expect.add((did, src, rk))
    got = {
        (r.doc_id, r.source, r.rk)
        for r in REG["sample_systematic"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
    assert len(got) == 4  # ceil(15/10) per source


def test_absence_streaks_planted(spark, tmp_path):
    """User 1 active on days {1,3,7} -> 3 fully absent days (4,5,6);
    user 2 active one day and user 3 active on consecutive days both
    report 0 absent days (consistent zero-absence baseline)."""
    rows, eid = [], 0
    for uid, days in ((1, (1, 3, 7)), (2, (5,)), (3, (2, 3, 4))):
        for d in days:
            eid += 1
            rows.append((eid, uid, _ts(d), 1.0, "a"))
    write_fixture(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r.max_gap_days: r.n_users
        for r in REG["events_absence_streaks"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {0: 2, 3: 1}
