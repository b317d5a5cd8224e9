"""Planted-semantics tests for round-10 batch 39 (the oracle gate
can't catch a flaw mirrored into the SQL twin; hand-computed fixtures
can)."""

from __future__ import annotations

import datetime

import duckdb

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


def _d(day: int, month: int = 1, year: int = 2024) -> datetime.datetime:
    return datetime.datetime(year, month, day)


def _duck(tmp_path, table: str, sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{tmp_path}/{table}.parquet/*.parquet')"
    )
    out = con.execute(sql).df()
    con.close()
    return out


# --------------------------------------------------------------------
# one-way ANOVA
# --------------------------------------------------------------------


def test_stats_anova_oneway_planted(spark, tmp_path):
    # A: qty [1,2,3] -> cents [100,200,300]; B: [4,5,6]; C: [7,8,9].
    # Hand-fold: SSW = 3*20000 = 60000; SSB = 2790000 - 4500^2/9 =
    # 540000; F = (540000/2)/(60000/6) = 27.0; eta = 540000/600000.
    rows = [
        (i + 1, 1, g, float(q), 1.0, _d(1))
        for i, (g, q) in enumerate(
            [("A", 1), ("A", 2), ("A", 3), ("B", 4), ("B", 5), ("B", 6),
             ("C", 7), ("C", 8), ("C", 9)]
        )
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    [r] = REG["stats_anova_oneway"].fn(spark, str(tmp_path)).collect()
    assert (r.n_groups, r.n_rows) == (3, 9)
    assert r.f_milli == 27000
    assert r.eta_sq_ppm == 900000


def test_stats_anova_degenerate_null_both_engines(spark, tmp_path):
    # single group -> k < 2 -> NULL F; constant values -> ssw = 0 ->
    # NULL F; neither throws on either engine
    import pandas as pd

    rows = [(1, 1, "A", 2.0, 1.0, _d(1)), (2, 1, "A", 3.0, 1.0, _d(1))]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    [r] = REG["stats_anova_oneway"].fn(spark, str(tmp_path)).collect()
    assert r.n_groups == 1 and r.f_milli is None
    o = _duck(tmp_path, "lineitem", REG["stats_anova_oneway"].sql)
    assert pd.isna(o.f_milli[0])

    rows = [(1, 1, "A", 2.0, 1.0, _d(1)), (2, 1, "B", 2.0, 1.0, _d(1))]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    [r] = REG["stats_anova_oneway"].fn(spark, str(tmp_path)).collect()
    assert r.n_groups == 2 and r.f_milli is None  # ssw == 0
    o = _duck(tmp_path, "lineitem", REG["stats_anova_oneway"].sql)
    assert pd.isna(o.f_milli[0])


def test_stats_levene_brown_forsythe_planted(spark, tmp_path):
    # A: qty [1,2,4] -> z = |2v - 2*med| = [200, 0, 400];
    # B: [5,5,5] -> z = [0,0,0].
    # Fold on z: SSB = 120000 - 600^2/6 = 60000; SSW = 80000;
    # W = (60000/1)/(80000/4) = 3.0; eta = 60000/140000.
    rows = [
        (1, 1, "A", 1.0, 1.0, _d(1)), (2, 1, "A", 2.0, 1.0, _d(1)),
        (3, 1, "A", 4.0, 1.0, _d(1)),
        (4, 1, "B", 5.0, 1.0, _d(1)), (5, 1, "B", 5.0, 1.0, _d(1)),
        (6, 1, "B", 5.0, 1.0, _d(1)),
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    [r] = REG["stats_levene_brown_forsythe"].fn(spark, str(tmp_path)).collect()
    assert (r.n_groups, r.n_rows) == (2, 6)
    assert r.bf_w_milli == 3000
    assert r.eta_sq_ppm == 428571  # floor(60000/140000 * 1e6 + 0.5)


# --------------------------------------------------------------------
# Kruskal-Wallis
# --------------------------------------------------------------------


def test_stats_kruskal_wallis_no_ties_planted(spark, tmp_path):
    # A: values [1,2,3], B: [4,5,6] (no ties): ranks 1..6, R_A=6,
    # R_B=15; H = 12/42 * (36/3 + 225/3) - 21 = 3.857142...;
    # no ties -> corrected == raw.
    rows = [
        (i + 1, 1, _d(1 + i), float(v), g)
        for i, (g, v) in enumerate(
            [("A", 1), ("A", 2), ("A", 3), ("B", 4), ("B", 5), ("B", 6)]
        )
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_kruskal_wallis"].fn(spark, str(tmp_path)).collect()
    assert (r.n_groups, r.n_rows, r.tie_term) == (2, 6, 0)
    assert r.h_milli == 3857  # floor(3857.142... + 0.5)
    assert r.h_corr_milli == 3857


def test_stats_kruskal_wallis_ties_planted(spark, tmp_path):
    # A: [1,1], B: [1,2]: value 1 is a 3-way tie (avg rank 2, doubled
    # 4), value 2 rank 4 (doubled 8).  R2_A=8 -> qt 64 DIV 8 = 8;
    # R2_B=12 -> qt 144 DIV 8 = 18; H = 12/20 * 26 - 15 = 0.6;
    # tie = 3^3-3 = 24; corr = 1 - 24/60 = 0.6; H' = 1.0.
    rows = [
        (1, 1, _d(1), 1.0, "A"), (2, 1, _d(2), 1.0, "A"),
        (3, 1, _d(3), 1.0, "B"), (4, 1, _d(4), 2.0, "B"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_kruskal_wallis"].fn(spark, str(tmp_path)).collect()
    assert (r.n_groups, r.n_rows, r.tie_term) == (2, 4, 24)
    assert r.h_milli == 600
    assert r.h_corr_milli == 1000


def test_stats_kruskal_wallis_all_tied_null_corrected_both_engines(
    spark, tmp_path
):
    # every value identical: correction factor 0 -> NULL corrected H
    # on BOTH engines; the raw H shows the documented DIV-floor bias
    # (-0.6 here: qt = 100 DIV 8 = 12 vs exact 12.5) identically on
    # both sides.
    import pandas as pd

    rows = [
        (1, 1, _d(1), 5.0, "A"), (2, 1, _d(2), 5.0, "A"),
        (3, 1, _d(3), 5.0, "B"), (4, 1, _d(4), 5.0, "B"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_kruskal_wallis"].fn(spark, str(tmp_path)).collect()
    assert r.h_corr_milli is None
    assert r.h_milli == -600
    o = _duck(tmp_path, "events", REG["stats_kruskal_wallis"].sql)
    assert pd.isna(o.h_corr_milli[0]) and int(o.h_milli[0]) == -600


# --------------------------------------------------------------------
# Poisson rate ratio
# --------------------------------------------------------------------


def test_events_poisson_rate_ratio_planted(spark, tmp_path):
    # span Jan 1 .. Jan 30 -> midpoint ~Jan 15.5; type x: 4 pre,
    # 9 post -> ratio 2.25e6 ppm, z = 2*(3-2) = 2.0; type y: 2/2 ->
    # ratio 1e6, z = 0.
    rows, eid = [], 0

    def add(day, etype):
        nonlocal eid
        eid += 1
        rows.append((eid, 1, _d(day), 1.0, etype))

    for _ in range(4):
        add(1, "x")
    for _ in range(9):
        add(30, "x")
    add(2, "y"); add(3, "y"); add(28, "y"); add(29, "y")
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.event_type: (r.n_pre, r.n_post, r.rate_ratio_ppm, r.z_milli)
        for r in REG["events_poisson_rate_ratio"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {"x": (4, 9, 2250000, 2000), "y": (2, 2, 1000000, 0)}


def test_events_poisson_rate_ratio_zero_pre_null_both_engines(spark, tmp_path):
    # a type with zero pre-period events -> NULL ratio (no ANSI
    # divide-by-zero throw), z still defined
    import pandas as pd

    rows = [
        (1, 1, _d(1), 1.0, "anchor"),       # anchors the span start
        (2, 1, _d(30), 1.0, "anchor"),
        (3, 1, _d(29), 1.0, "late"),        # post-only type
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.event_type: (r.n_pre, r.n_post, r.rate_ratio_ppm, r.z_milli)
        for r in REG["events_poisson_rate_ratio"].fn(spark, str(tmp_path)).collect()
    }
    assert out["late"] == (0, 1, None, 2000)
    o = _duck(tmp_path, "events", REG["events_poisson_rate_ratio"].sql)
    late = o[o.event_type == "late"].iloc[0]
    assert pd.isna(late.rate_ratio_ppm)


# --------------------------------------------------------------------
# DAU / MAU stickiness + power-user curve
# --------------------------------------------------------------------


def test_events_dau_mau_stickiness_planted(spark, tmp_path):
    # user 1 active Jan 1 + Jan 2; user 2 active Jan 1 only.
    # Jan 1: DAU 2, MAU 2 (both same-day) -> 1e6 ppm.
    # Jan 2: DAU 1, trailing-28 MAU 2 -> 500000 ppm.
    rows = [
        (1, 1, _d(1), 1.0, "view"),
        (2, 1, _d(1), 2.0, "view"),   # same user+day dedupes
        (3, 2, _d(1), 1.0, "view"),
        (4, 1, _d(2), 1.0, "view"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = [
        (r.day, r.dau, r.mau, r.stickiness_ppm)
        for r in REG["events_dau_mau_stickiness"].fn(spark, str(tmp_path)).collect()
    ]
    assert out == [
        ("2024-01-01", 2, 2, 1000000),
        ("2024-01-02", 1, 2, 500000),
    ]


def test_events_dau_mau_window_expires_after_28_days(spark, tmp_path):
    # user 2's Jan 1 activity must NOT count toward Feb 5 MAU
    # (35 days later), but user 1's Jan 20 does (16 days).
    rows = [
        (1, 2, _d(1), 1.0, "view"),
        (2, 1, _d(20), 1.0, "view"),
        (3, 3, _d(5, month=2), 1.0, "view"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.day: (r.dau, r.mau)
        for r in REG["events_dau_mau_stickiness"].fn(spark, str(tmp_path)).collect()
    }
    assert out["2024-02-05"] == (1, 2)  # user 3 + user 1; user 2 aged out


def test_events_power_user_curve_planted(spark, tmp_path):
    # Jan: user 1 active 2 days, user 2 active 1 day; Feb: user 1
    # active 1 day.
    rows = [
        (1, 1, _d(1), 1.0, "view"), (2, 1, _d(2), 1.0, "view"),
        (3, 1, _d(2), 2.0, "click"),          # same day, still 2 days
        (4, 2, _d(3), 1.0, "view"),
        (5, 1, _d(1, month=2), 1.0, "view"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = [
        (r.month, r.active_days, r.n_users)
        for r in REG["events_power_user_curve"].fn(spark, str(tmp_path)).collect()
    ]
    assert out == [
        ("2024-01", 1, 1),
        ("2024-01", 2, 1),
        ("2024-02", 1, 1),
    ]


# --------------------------------------------------------------------
# assortment churn
# --------------------------------------------------------------------


def test_part_sales_churn_planted(spark, tmp_path):
    # part 1: 1995+1996; part 2: 1995 only; part 3: 1996+1997.
    # 1995: active {1,2}, churned {2} -> 50%.  1996: active {1,3},
    # churned {1} -> 50%.  1997 (max year) excluded.
    rows = [
        (1, 1, "N", 1.0, 1.0, _d(5, year=1995)),
        (2, 1, "N", 1.0, 1.0, _d(6, year=1996)),
        (3, 2, "N", 1.0, 1.0, _d(7, year=1995)),
        (4, 3, "N", 1.0, 1.0, _d(8, year=1996)),
        (5, 3, "N", 1.0, 1.0, _d(9, year=1997)),
        (6, 3, "N", 1.0, 1.0, _d(10, year=1997)),  # dup (part,yr) dedupes
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    out = [
        (r.yr, r.n_active, r.n_churned, r.churn_ppm)
        for r in REG["part_sales_churn"].fn(spark, str(tmp_path)).collect()
    ]
    assert out == [
        (1995, 2, 1, 500000),
        (1996, 2, 1, 500000),
    ]


def test_orders_repeat_purchase_latency_planted(spark, tmp_path):
    # customer 1: orders on Jan 1 + Jan 11 -> 10-day gap; customer 2:
    # one order only (excluded); customer 3: two same-instant orders
    # (no strictly-later second -> excluded); customer 4: Jan 1 + Jan 2
    # + Jan 20 -> gap 1 (second, not third).
    o_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    c_schema = (
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string"
    )
    orders = [
        (1, 1, "O", 1.0, _d(1), "1-URGENT"),
        (2, 1, "O", 1.0, _d(11), "1-URGENT"),
        (3, 2, "O", 1.0, _d(1), "1-URGENT"),
        (4, 3, "O", 1.0, _d(5), "1-URGENT"),
        (5, 3, "O", 1.0, _d(5), "1-URGENT"),
        (6, 4, "O", 1.0, _d(1), "1-URGENT"),
        (7, 4, "O", 1.0, _d(2), "1-URGENT"),
        (8, 4, "O", 1.0, _d(20), "1-URGENT"),
    ]
    custs = [
        (1, "a", 0, 0.0, "AUTO"),
        (2, "b", 0, 0.0, "AUTO"),
        (3, "c", 0, 0.0, "AUTO"),
        (4, "d", 0, 0.0, "BUILDING"),
    ]
    _write(spark, tmp_path, "orders", orders, o_schema)
    _write(spark, tmp_path, "customer", custs, c_schema)
    out = {
        r.c_mktsegment: (r.n_repeat, r.q1_days, r.med_days, r.q3_days)
        for r in REG["orders_repeat_purchase_latency"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        "AUTO": (1, 10.0, 10.0, 10.0),
        "BUILDING": (1, 1.0, 1.0, 1.0),
    }


# --------------------------------------------------------------------
# Fano burstiness + runs test + modularity (batch 42)
# --------------------------------------------------------------------


def test_events_burstiness_fano_planted(spark, tmp_path):
    # type A daily counts over the 3-day span: [2, 0, 4] (day 2 is
    # zero-FILLED by the spine) -> mean 2, pop var 8/3, fano 4/3.
    # type B anchors the span with [1, 1, 1] -> fano 0.
    rows = [
        (1, 1, _d(1), 1.0, "A"), (2, 1, _d(1), 1.0, "A"),
        (3, 1, _d(3), 1.0, "A"), (4, 1, _d(3), 1.0, "A"),
        (5, 1, _d(3), 1.0, "A"), (6, 1, _d(3), 1.0, "A"),
        (7, 1, _d(1), 1.0, "B"), (8, 1, _d(2), 1.0, "B"),
        (9, 1, _d(3), 1.0, "B"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {
        r.event_type: (r.n_days, r.total, r.fano_milli)
        for r in REG["events_burstiness_fano"].fn(spark, str(tmp_path)).collect()
    }
    # A: (3*20 - 36) / (3*6) = 24/18 = 1.3333 -> 1333
    assert out == {"A": (3, 6, 1333), "B": (3, 3, 0)}


def test_stats_runs_test_planted(spark, tmp_path):
    # daily revenue 1,2,1,2,2,3 (cents x100): the flat 2->2 day drops,
    # direction sequence U D U U -> runs = 3, n_up 3, n_down 1.
    # mu = 2*3*1/4 + 1 = 2.5; sigma2 = 6*(6-4)/(16*3) = 0.25;
    # z = (3 - 2.5)/0.5 = 1.0.
    o_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    revs = [1.0, 2.0, 1.0, 2.0, 2.0, 3.0]
    orders = [
        (i + 1, 1, "O", rev, _d(i + 1), "1-URGENT")
        for i, rev in enumerate(revs)
    ]
    _write(spark, tmp_path, "orders", orders, o_schema)
    [r] = REG["stats_runs_test"].fn(spark, str(tmp_path)).collect()
    assert (r.n_up, r.n_down, r.n_runs, r.z_milli) == (3, 1, 3, 1000)


def test_stats_runs_test_monotone_null_both_engines(spark, tmp_path):
    # strictly increasing revenue: n_down = 0 -> sigma2 = 0 -> NULL z
    # on BOTH engines
    import pandas as pd

    o_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    orders = [
        (i + 1, 1, "O", float(i + 1), _d(i + 1), "1-URGENT") for i in range(4)
    ]
    _write(spark, tmp_path, "orders", orders, o_schema)
    [r] = REG["stats_runs_test"].fn(spark, str(tmp_path)).collect()
    assert (r.n_up, r.n_down, r.z_milli) == (3, 0, None)
    o = _duck(tmp_path, "orders", REG["stats_runs_test"].sql)
    assert pd.isna(o.z_milli[0])


def test_graph_community_modularity_two_cliques(spark, tmp_path):
    # two disjoint part-triangles, each pair co-occurring in 2 orders
    # (the >= 2 support gate): LPA converges each clique to its min
    # label -> 2 communities; m = 6, e_c = 3, d_c = 6 each ->
    # Q = 2 * (3/6 - (6/12)^2) = 0.5 exactly (all DIV terms exact).
    rows, key = [], 0
    for okey, parts in [
        (1, (1, 2, 3)), (2, (1, 2, 3)),
        (3, (11, 12, 13)), (4, (11, 12, 13)),
    ]:
        for pk in parts:
            key += 1
            rows.append((okey, pk, "N", 1.0, 1.0, _d(1)))
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    [r] = REG["graph_community_modularity"].fn(spark, str(tmp_path)).collect()
    assert (r.n_communities, r.m_edges, r.modularity_ppm) == (2, 6, 500000)


def test_stats_runs_test_single_pair_null_both_engines(spark, tmp_path):
    # revenues [1,2,1]: n_up = n_down = 1 makes sigma2 exactly 0 —
    # NULL z on BOTH engines (review r10: the old guard let Spark
    # throw DIVIDE_BY_ZERO where the twin returned NULL)
    import pandas as pd

    o_schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    orders = [
        (1, 1, "O", 1.0, _d(1), "1-URGENT"),
        (2, 1, "O", 2.0, _d(2), "1-URGENT"),
        (3, 1, "O", 1.0, _d(3), "1-URGENT"),
    ]
    _write(spark, tmp_path, "orders", orders, o_schema)
    [r] = REG["stats_runs_test"].fn(spark, str(tmp_path)).collect()
    assert (r.n_up, r.n_down, r.z_milli) == (1, 1, None)
    o = _duck(tmp_path, "orders", REG["stats_runs_test"].sql)
    assert pd.isna(o.z_milli[0])


def test_stats_friedman_planted(spark, tmp_path):
    # type A beats type B every day for 3 days (perfectly consistent
    # blocks): doubled ranks 4/2, R2 = (12, 6), qsum = 180;
    # Q = 3*180/(3*2*3) - 3*3*3 = 3.0 (the k=2 maximum n(k-1));
    # no within-day ties -> corrected == raw.
    rows, eid = [], 0
    for day in (1, 2, 3):
        for _ in range(2):
            eid += 1
            rows.append((eid, 1, _d(day), 1.0, "A"))
        eid += 1
        rows.append((eid, 1, _d(day), 1.0, "B"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_friedman"].fn(spark, str(tmp_path)).collect()
    assert (r.n_days, r.n_types, r.tie_term) == (3, 2, 0)
    assert r.q_milli == 3000
    assert r.q_corr_milli == 3000


def test_stats_friedman_all_tied_null_corrected_both_engines(spark, tmp_path):
    # equal counts every day: every block fully tied -> Q = 0 and the
    # tie correction hits exactly 0 -> NULL corrected on BOTH engines
    import pandas as pd

    rows, eid = [], 0
    for day in (1, 2, 3):
        for et in ("A", "B"):
            eid += 1
            rows.append((eid, 1, _d(day), 1.0, et))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_friedman"].fn(spark, str(tmp_path)).collect()
    assert (r.n_days, r.n_types, r.tie_term) == (3, 2, 18)
    assert r.q_milli == 0 and r.q_corr_milli is None
    o = _duck(tmp_path, "events", REG["stats_friedman"].sql)
    assert int(o.q_milli[0]) == 0 and pd.isna(o.q_corr_milli[0])


def test_stats_cvm_drift_planted(spark, tmp_path):
    # clicks values [1, 2], purchases [1, 3]: CDF gap only on bin 20
    # (500000 ppm, weight 1): T = (2*2/16) * 0.25 = 0.0625 -> 63 milli
    rows = [
        (1, 1, _d(1), 1.0, "click"), (2, 1, _d(1), 2.0, "click"),
        (3, 1, _d(1), 1.0, "purchase"), (4, 1, _d(1), 3.0, "purchase"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_cvm_drift"].fn(spark, str(tmp_path)).collect()
    assert (r.n_click, r.n_purchase) == (2, 2)
    assert r.cvm_t_milli == 63


def test_stats_cvm_drift_one_sided_zero_rows_both_engines(spark, tmp_path):
    # clicks only: a two-sample statistic needs both samples -> zero
    # rows on BOTH engines (the agg_ks_drift contract)
    rows = [(1, 1, _d(1), 1.0, "click"), (2, 1, _d(1), 2.0, "click")]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    assert REG["stats_cvm_drift"].fn(spark, str(tmp_path)).count() == 0
    o = _duck(tmp_path, "events", REG["stats_cvm_drift"].sql)
    assert len(o) == 0


def test_stats_kruskal_wallis_null_values_excluded_both_engines(
    spark, tmp_path
):
    # NULL values must not perturb the ranks: a NULL tie-group would
    # land in the top bucket on both engines (least() skips NULL) but
    # sort FIRST in Spark's within-bucket window and LAST in DuckDB's
    # (review r10).  With the explicit exclusion, the result equals
    # the no-ties planted case exactly, on both engines.
    rows = [
        (i + 1, 1, _d(1 + i), float(v), g)
        for i, (g, v) in enumerate(
            [("A", 1), ("A", 2), ("A", 3), ("B", 4), ("B", 5), ("B", 6)]
        )
    ] + [(10, 1, _d(10), None, "A"), (11, 1, _d(11), None, "B")]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    [r] = REG["stats_kruskal_wallis"].fn(spark, str(tmp_path)).collect()
    assert (r.n_groups, r.n_rows, r.tie_term) == (2, 6, 0)
    assert (r.h_milli, r.h_corr_milli) == (3857, 3857)
    o = _duck(tmp_path, "events", REG["stats_kruskal_wallis"].sql)
    assert (int(o.n_rows[0]), int(o.h_milli[0]), int(o.h_corr_milli[0])) == (
        6, 3857, 3857,
    )
