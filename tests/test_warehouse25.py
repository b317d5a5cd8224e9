"""Planted-semantics tests for round-8 batch 33 (the oracle gate can't
catch a flaw mirrored into the SQL twin; hand-computed fixtures can)."""

from __future__ import annotations

import datetime
import hashlib
import math

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture

LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_returnflag string, "
    "l_quantity double, l_extendedprice double, l_shipdate timestamp"
)
EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, event_type string"
)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _variant(uid: int) -> str:
    """Python replay of the md5 hash-bucket split both engines use."""
    h = hashlib.md5(f"{uid}|exp1".encode()).hexdigest()
    return "control" if int(h[:15], 16) % 1000 < 500 else "treatment"


def _d(day: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, day)


# --------------------------------------------------------------------
# Spearman
# --------------------------------------------------------------------


def test_stats_spearman_planted(spark, tmp_path):
    # group A: x=[1,2,3], y=[3,1,2] (no ties): rho = 1 - 6*6/(3*8) = -0.5
    # group B: x=[1,2,2,3] monotone with y (tied pair aligned): rho = 1
    # group C: all x equal -> zero rank variance -> NULL
    rows = (
        [(1, 1, "A", 1.0, 3.0, _d(1)), (2, 1, "A", 2.0, 1.0, _d(1)),
         (3, 1, "A", 3.0, 2.0, _d(1))]
        + [(4, 1, "B", 1.0, 10.0, _d(1)), (5, 1, "B", 2.0, 20.0, _d(1)),
           (6, 1, "B", 2.0, 20.0, _d(1)), (7, 1, "B", 3.0, 40.0, _d(1))]
        + [(8, 1, "C", 5.0, 1.0, _d(1)), (9, 1, "C", 5.0, 2.0, _d(1))]
    )
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    out = {
        r.l_returnflag: (r.n, r.spearman_ppm)
        for r in REG["stats_spearman"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {"A": (3, -500000), "B": (4, 1000000), "C": (2, None)}


# --------------------------------------------------------------------
# Neyman allocation
# --------------------------------------------------------------------


def test_sample_stratified_neyman_planted(spark, tmp_path):
    # A: chars [10, 10] -> std 0 -> weight 0; B: [0, 20] -> std 10 ->
    # weight 2e7.  Whole budget goes to B; allocations sum to 500.
    rows = [
        (1, "t", "en", "A", 10), (2, "t", "en", "A", 10),
        (3, "t", "en", "B", 0), (4, "t", "en", "B", 20),
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.source: (r.n_docs, r.std_chars_milli, r.base, r.bonus, r.n_alloc)
        for r in REG["sample_stratified_neyman"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        "A": (2, 0, 0, 0, 0),
        "B": (2, 10000, 500, 0, 500),
    }


def test_sample_stratified_neyman_all_zero_variance(spark, tmp_path):
    # degenerate: every stratum has constant n_chars -> total weight 0
    # is clamped to 1 (no ANSI divide throw); bases are 0 and the
    # leftover bonus hands 1 doc to each source — both engines agree.
    import duckdb

    rows = [(1, "t", "en", "A", 10), (2, "t", "en", "B", 20)]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.source: (r.base, r.n_alloc)
        for r in REG["sample_stratified_neyman"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {"A": (0, 1), "B": (0, 1)}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    o = con.execute(REG["sample_stratified_neyman"].sql).df()
    con.close()
    assert sorted(zip(o.source, o.n_alloc)) == [("A", 1), ("B", 1)]


# --------------------------------------------------------------------
# CUPED
# --------------------------------------------------------------------


def _cuped_expected(user_vals):
    """Pure-Python replay: user_vals = {uid: (pre_cents, post_cents)}."""
    xs = {u: v[0] for u, v in user_vals.items()}
    ys = {u: v[1] for u, v in user_vals.items()}
    n = len(user_vals)
    sx, sy = sum(xs.values()), sum(ys.values())
    sxx = sum(v * v for v in xs.values())
    syy = sum(v * v for v in ys.values())
    sxy = sum(xs[u] * ys[u] for u in xs)
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cxy = n * sxy - sx * sy
    theta = cxy / vx if vx > 0 else 0.0
    mx_pool = sx / n
    vr = (cxy * cxy / (vx * vy)) if vx > 0 and vy > 0 else 0.0
    out = {}
    for variant in ("control", "treatment"):
        us = [u for u in user_vals if _variant(u) == variant]
        if not us:
            continue
        my = sum(ys[u] for u in us) / len(us)
        mx = sum(xs[u] for u in us) / len(us)
        adj = my - theta * (mx - mx_pool)
        out[variant] = (
            len(us),
            math.floor(my * 10 + 0.5),
            math.floor(adj * 10 + 0.5),
            math.floor(theta * 1e6 + 0.5),
            math.floor(vr * 1e6 + 0.5),
        )
    return out


def test_stats_cuped_planted(spark, tmp_path):
    # pre events on Jan 1-10, post on Jan 20-30 (midpoint splits
    # cleanly); per-user pre/post sums chosen correlated
    user_vals = {1: (100, 210), 2: (200, 420), 3: (300, 590), 4: (400, 810)}
    rows, eid = [], 0
    for uid, (pre, post) in user_vals.items():
        eid += 1
        rows.append((eid, uid, _d(1), pre / 100.0, "view"))
        eid += 1
        rows.append((eid, uid, _d(30), post / 100.0, "view"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.variant: (
            r.n_users, r.mean_post_milli, r.mean_cuped_milli,
            r.theta_ppm, r.var_reduction_ppm,
        )
        for r in REG["stats_cuped"].fn(spark, str(tmp_path)).collect()
    }
    assert out == _cuped_expected(user_vals)


def test_stats_cuped_zero_pre_variance_degrades(spark, tmp_path):
    # all users identical pre-period -> var(x)=0 -> theta=0, adjusted
    # mean == raw mean, no ANSI throw on either engine
    import duckdb

    user_vals = {1: (100, 210), 2: (100, 420), 3: (100, 590)}
    rows, eid = [], 0
    for uid, (pre, post) in user_vals.items():
        eid += 1
        rows.append((eid, uid, _d(1), pre / 100.0, "view"))
        eid += 1
        rows.append((eid, uid, _d(30), post / 100.0, "view"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    res = REG["stats_cuped"].fn(spark, str(tmp_path)).collect()
    for r in res:
        assert r.theta_ppm == 0
        assert r.mean_cuped_milli == r.mean_post_milli
        assert r.var_reduction_ppm == 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    o = con.execute(REG["stats_cuped"].sql).df()
    con.close()
    assert (o.theta_ppm == 0).all()


def test_stats_cuped_big_spend_no_overflow_both_engines(spark, tmp_path):
    # r10 ADVICE fix: a per-user half-period spend past ~2^31.5 cents
    # makes the per-row x*x product pass 2^63; the operand must widen
    # BEFORE the multiply (Spark decimal(19,0), DuckDB HUGEINT) or both
    # engines throw.  4e9 cents squared = 1.6e19 > 2^63 ~ 9.2e18.
    import duckdb

    user_vals = {
        1: (4_000_000_000, 4_100_000_000),
        2: (4_200_000_000, 4_300_000_000),
        3: (4_400_000_000, 4_600_000_000),
    }
    rows, eid = [], 0
    for uid, (pre, post) in user_vals.items():
        eid += 1
        rows.append((eid, uid, _d(1), pre / 100.0, "view"))
        eid += 1
        rows.append((eid, uid, _d(30), post / 100.0, "view"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.variant: (
            r.n_users, r.mean_post_milli, r.mean_cuped_milli,
            r.theta_ppm, r.var_reduction_ppm,
        )
        for r in REG["stats_cuped"].fn(spark, str(tmp_path)).collect()
    }
    assert out == _cuped_expected(user_vals)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    o = con.execute(REG["stats_cuped"].sql).df()
    con.close()
    got = {
        v: (int(n), int(mp), int(mc), int(tp), int(vr))
        for v, n, mp, mc, tp, vr in zip(
            o.variant, o.n_users, o.mean_post_milli, o.mean_cuped_milli,
            o.theta_ppm, o.var_reduction_ppm,
        )
    }
    assert got == _cuped_expected(user_vals)


# --------------------------------------------------------------------
# power / MDE
# --------------------------------------------------------------------


def test_stats_power_mde_planted(spark, tmp_path):
    # one day; users 1..10, purchases for three of them
    rows, eid = [], 0
    buyers = {1, 2, 3}
    for uid in range(1, 11):
        eid += 1
        rows.append((eid, uid, _d(5), 1.0, "view"))
        if uid in buyers:
            eid += 1
            rows.append((eid, uid, _d(5), 5.0, "purchase"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_power_mde"].fn(spark, str(tmp_path)).collect()
    n_a = sum(1 for u in range(1, 11) if _variant(u) == "control")
    n_b = 10 - n_a
    p = 3 / 10
    mde = (1.959964 + 0.841621) * math.sqrt(2 * p * (1 - p) / min(n_a, n_b))
    assert (r.day, r.n_a, r.n_b, r.p_pool_ppm, r.mde_abs_ppm) == (
        "2024-01-05",
        n_a,
        n_b,
        math.floor(p * 1e6 + 0.5),
        math.floor(mde * 1e6 + 0.5),
    )


def test_stats_power_mde_degenerate_rates(spark, tmp_path):
    # p = 0 (no purchases) -> NULL mde; single-variant day -> NULL mde
    rows = [(1, 1, _d(5), 1.0, "view"), (2, 2, _d(5), 1.0, "view")]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_power_mde"].fn(spark, str(tmp_path)).collect()
    assert r.p_pool_ppm == 0 and r.mde_abs_ppm is None


# --------------------------------------------------------------------
# difference-in-differences
# --------------------------------------------------------------------


def test_events_did_estimator_planted(spark, tmp_path):
    # find one control and one treatment user deterministically
    ctl = next(u for u in range(1, 50) if _variant(u) == "control")
    trt = next(u for u in range(1, 50) if _variant(u) == "treatment")
    # control: 10.00 pre -> 12.00 post (+2); treatment: 20.00 -> 25.00
    # (+5); DiD = +3.00 = 3000 milli
    rows = [
        (1, ctl, _d(1), 10.0, "view"), (2, ctl, _d(30), 12.0, "view"),
        (3, trt, _d(1), 20.0, "view"), (4, trt, _d(30), 25.0, "view"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["events_did_estimator"].fn(spark, str(tmp_path)).collect()
    assert (r.n_ctl_pre, r.n_ctl_post, r.n_trt_pre, r.n_trt_post) == (1, 1, 1, 1)
    assert (r.ctl_pre_milli, r.ctl_post_milli) == (10000, 12000)
    assert (r.trt_pre_milli, r.trt_post_milli) == (20000, 25000)
    assert r.did_milli == 3000


# --------------------------------------------------------------------
# Mahalanobis outliers
# --------------------------------------------------------------------


def test_embed_outlier_mahalanobis_planted(spark, tmp_path):
    # dim0: values [0, 0, 6] -> mu=2, var=8; dim1 constant (var 0 ->
    # contributes 0); dim2: [1, -1, 0] -> mu=0, var=2/3.
    # D2: v1=(0-2)^2/8 + 1/(2/3) = 0.5+1.5 = 2; v2 = 0.5+1.5 = 2;
    # v3 = (6-2)^2/8 + 0 = 2.  All tie at 2.0 -> order by vec_id.
    vecs = [
        (1, [0.0, 5.0, 1.0], 0),
        (2, [0.0, 5.0, -1.0], 0),
        (3, [6.0, 5.0, 0.0], 1),
    ]
    _write(
        spark, tmp_path, "embeddings", vecs,
        "vec_id long, embedding array<float>, label long",
    )
    out = [
        (r.vec_id, r.label, r.d2_nano)
        for r in REG["embed_outlier_mahalanobis"].fn(spark, str(tmp_path)).collect()
    ]
    assert out == [(1, 0, 2_000_000_000), (2, 0, 2_000_000_000),
                   (3, 1, 2_000_000_000)]


# --------------------------------------------------------------------
# price indexes
# --------------------------------------------------------------------


def test_orders_price_index_planted(spark, tmp_path):
    # base 2023: part1 unit 1.00 x10, part2 unit 2.00 x5
    # 2024: part1 unit 1.10 x8, part2 unit 2.20 x10 (uniform +10%)
    # part3 only exists in 2024 -> excluded by the base join
    y1, y2 = datetime.datetime(2023, 6, 1), datetime.datetime(2024, 6, 1)
    rows = [
        (1, 1, "N", 10.0, 10.00, y1),
        (2, 2, "N", 5.0, 10.00, y1),
        (3, 1, "N", 8.0, 8.80, y2),
        (4, 2, "N", 10.0, 22.00, y2),
        (5, 3, "N", 4.0, 4.00, y2),
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    out = {
        r.yr: (r.n_parts, r.laspeyres_ppm, r.paasche_ppm, r.fisher_ppm)
        for r in REG["orders_price_index_laspeyres"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        2023: (2, 1000000, 1000000, 1000000),
        2024: (2, 1100000, 1100000, 1100000),
    }


def test_sample_stratified_neyman_negative_float_variance(spark, tmp_path):
    # review r8 repro: 9 docs of n_chars=100000002 make the float
    # variance round to ~-1.78 (sx*sx > 2^53); the greatest(...,0)
    # clamp must keep DuckDB's sqrt from throwing and yield std 0 on
    # both engines.
    import duckdb

    rows = [(i, "t", "en", "A", 100000002) for i in range(9)]
    rows += [(100, "t", "en", "B", 0), (101, "t", "en", "B", 20)]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.source: (r.std_chars_milli, r.n_alloc)
        for r in REG["sample_stratified_neyman"].fn(spark, str(tmp_path)).collect()
    }
    assert out["A"] == (0, 0)
    assert out["B"] == (10000, 500)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    o = con.execute(REG["sample_stratified_neyman"].sql).df()
    con.close()
    assert sorted(zip(o.source, o.std_chars_milli)) == [("A", 0), ("B", 10000)]


def test_events_did_estimator_empty_cell_null_both_engines(spark, tmp_path):
    # review r8: treatment user only active post-midpoint -> the
    # (treat, pre) cell is empty -> NULL mean flows into a NULL DiD on
    # BOTH engines (no throw, no fabricated zero).
    import duckdb

    ctl = next(u for u in range(1, 50) if _variant(u) == "control")
    trt = next(u for u in range(1, 50) if _variant(u) == "treatment")
    rows = [
        (1, ctl, _d(1), 10.0, "view"), (2, ctl, _d(30), 12.0, "view"),
        (3, trt, _d(30), 25.0, "view"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["events_did_estimator"].fn(spark, str(tmp_path)).collect()
    assert r.n_trt_pre == 0
    assert r.trt_pre_milli is None and r.did_milli is None
    assert r.ctl_pre_milli == 10000
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    o = con.execute(REG["events_did_estimator"].sql).df()
    con.close()
    import pandas as pd

    assert int(o.n_trt_pre[0]) == 0 and pd.isna(o.did_milli[0])


def test_orders_price_index_zero_price_year_null_both_engines(spark, tmp_path):
    # review r8: a base year whose every line is zero-priced makes the
    # index denominators 0 -> NULL ppm on BOTH engines (Spark would
    # otherwise throw DIVIDE_BY_ZERO; DuckDB would NaN-cast-error).
    import datetime as _dt

    import duckdb

    y1, y2 = _dt.datetime(2023, 6, 1), _dt.datetime(2024, 6, 1)
    rows = [
        (1, 1, "N", 10.0, 0.0, y1),
        (2, 1, "N", 8.0, 8.80, y2),
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    out = {
        r.yr: (r.laspeyres_ppm, r.paasche_ppm, r.fisher_ppm)
        for r in REG["orders_price_index_laspeyres"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {2023: (None, None, None), 2024: (None, None, None)}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet/*.parquet')"
    )
    o = con.execute(REG["orders_price_index_laspeyres"].sql).df()
    con.close()
    assert o.laspeyres_ppm.isna().all()


# --------------------------------------------------------------------
# batch 35: McNemar + Cohen's d
# --------------------------------------------------------------------


def test_stats_mcnemar_planted(spark, tmp_path):
    # users: 2 pre-only converters (b), 1 post-only (c), 1 both, 1
    # never -> chi2 = (|2-1|-1)^2/3 = 0
    rows, eid = [], 0

    def add(uid, day, etype):
        nonlocal eid
        eid += 1
        rows.append((eid, uid, _d(day), 1.0, etype))

    for uid in (1, 2, 3, 4, 5):
        add(uid, 1, "view")
        add(uid, 30, "view")          # anchors the midpoint span
    add(1, 1, "purchase"); add(2, 1, "purchase")          # b: pre only
    add(3, 30, "purchase")                                 # c: post only
    add(4, 1, "purchase"); add(4, 30, "purchase")          # both
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_mcnemar"].fn(spark, str(tmp_path)).collect()
    assert (r.n_never, r.n_post_only, r.n_pre_only, r.n_both) == (1, 1, 2, 1)
    assert r.mcnemar_chi2_milli == 0


def test_stats_mcnemar_no_discordant_null_both_engines(spark, tmp_path):
    # no discordant pairs -> statistic undefined -> NULL both engines
    import duckdb

    rows = [
        (1, 1, _d(1), 1.0, "view"), (2, 1, _d(30), 1.0, "view"),
        (3, 1, _d(1), 1.0, "purchase"), (4, 1, _d(30), 1.0, "purchase"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_mcnemar"].fn(spark, str(tmp_path)).collect()
    assert r.n_both == 1 and r.mcnemar_chi2_milli is None
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    o = con.execute(REG["stats_mcnemar"].sql).df()
    con.close()
    import pandas as pd

    assert pd.isna(o.mcnemar_chi2_milli[0])


def test_stats_cohens_d_planted(spark, tmp_path):
    # 2 control users post spend [10.00, 20.00]; 2 treatment [30.00,
    # 40.00] (cents); pooled s = sqrt((q_c+q_t)/(n-2))
    ctls = [u for u in range(1, 100) if _variant(u) == "control"][:2]
    trts = [u for u in range(1, 100) if _variant(u) == "treatment"][:2]
    rows, eid = [], 0
    for uid, post in zip(ctls + trts, (10.0, 20.0, 30.0, 40.0)):
        eid += 1
        rows.append((eid, uid, _d(1), 0.0, "view"))
        eid += 1
        rows.append((eid, uid, _d(30), post, "view"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_cohens_d"].fn(spark, str(tmp_path)).collect()
    # cents: c=[1000,2000] m=1500 q=500000; t=[3000,4000] m=3500
    # q=500000; s_pool = sqrt(1000000/2) = 707.10678; d = 2000/707.107
    d = 2000 / math.sqrt(500000)
    assert (r.n_control, r.n_treatment) == (2, 2)
    assert (r.mean_control_milli, r.mean_treatment_milli) == (15000, 35000)
    assert r.cohens_d_milli == math.floor(d * 1000 + 0.5)


def test_stats_cohens_d_degenerate_null_both_engines(spark, tmp_path):
    # single-user variants (< 2) -> NULL d, no throw on either engine
    import duckdb

    ctl = next(u for u in range(1, 100) if _variant(u) == "control")
    trt = next(u for u in range(1, 100) if _variant(u) == "treatment")
    rows = [
        (1, ctl, _d(1), 0.0, "view"), (2, ctl, _d(30), 10.0, "view"),
        (3, trt, _d(1), 0.0, "view"), (4, trt, _d(30), 30.0, "view"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_cohens_d"].fn(spark, str(tmp_path)).collect()
    assert r.cohens_d_milli is None
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    o = con.execute(REG["stats_cohens_d"].sql).df()
    con.close()
    import pandas as pd

    assert pd.isna(o.cohens_d_milli[0])


def test_stats_mcnemar_null_event_type_both_engines(spark, tmp_path):
    # review r8 round 3: a user whose PRE-period rows are all
    # NULL-typed must flag pre_conv = 0 on BOTH engines (the old bool
    # cast made purch NULL, and an all-NULL max folded the flag to
    # NULL on Spark only).  User 1: NULL-typed pre rows + a post
    # purchase -> discordant cell c (post only), not a dropped user.
    import duckdb
    import pandas as pd

    rows = [
        (1, 1, _d(1), 1.0, None), (2, 1, _d(1), 1.0, None),
        (3, 1, _d(30), 1.0, "purchase"),
        (4, 2, _d(1), 1.0, "view"), (5, 2, _d(30), 1.0, "view"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_mcnemar"].fn(spark, str(tmp_path)).collect()
    assert (r.n_never, r.n_post_only, r.n_pre_only, r.n_both) == (1, 1, 0, 0)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    o = con.execute(REG["stats_mcnemar"].sql).df()
    con.close()
    assert (int(o.n_never[0]), int(o.n_post_only[0])) == (1, 1)
    assert (int(o.n_pre_only[0]), int(o.n_both[0])) == (0, 0)
