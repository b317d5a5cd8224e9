"""Planted-semantics tests for round-11 batch 46 (the oracle gate
can't catch a flaw mirrored into the SQL twin; hand-computed fixtures
can)."""

from __future__ import annotations

import datetime
import math

import numpy as np

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture

LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_returnflag string, "
    "l_quantity double, l_shipdate timestamp"
)
SUP_SCHEMA = "s_suppkey long, s_name string, s_nationkey long, s_acctbal double"
EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, event_type string"
)
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour)


# --------------------------------------------------------------------
# orders_basket_lift
# --------------------------------------------------------------------


def test_basket_lift_planted(spark, tmp_path):
    # Orders: {1: (A,B)}, {2: (A,B)}, {3: (A,C)}, {4: (C,)}.
    # N=4; n_A=3, n_B=2, n_C=2; pair (A,B): n=2 -> kept;
    # (A,C): n=1 -> dropped by the >=2 support floor.
    # conf(A->B) = 2/3 -> 666666 ppm; lift = 2*4/(3*2) -> 1333333 ppm.
    rows = [
        (1, 10, 1, "N", 1.0, _ts(1)),
        (1, 20, 1, "N", 1.0, _ts(1)),
        (2, 10, 1, "N", 1.0, _ts(1)),
        (2, 20, 1, "N", 1.0, _ts(1)),
        (3, 10, 1, "N", 1.0, _ts(1)),
        (3, 30, 1, "N", 1.0, _ts(1)),
        (4, 30, 1, "N", 1.0, _ts(1)),
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    got = REG["orders_basket_lift"].fn(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.part_a, r.part_b, r.n_pair, r.n_a, r.n_b) == (10, 20, 2, 3, 2)
    assert r.conf_a_to_b_ppm == 666666
    assert r.lift_ppm == 1333333


def test_basket_lift_duplicate_lines_collapse(spark, tmp_path):
    # The same part twice in one order (two lineitem rows) is ONE
    # basket membership — support counts baskets, not lines.
    rows = [
        (1, 10, 1, "N", 1.0, _ts(1)),
        (1, 10, 1, "N", 2.0, _ts(1)),
        (1, 20, 1, "N", 1.0, _ts(1)),
        (2, 10, 1, "N", 1.0, _ts(1)),
        (2, 20, 1, "N", 1.0, _ts(1)),
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    [r] = REG["orders_basket_lift"].fn(spark, str(tmp_path)).collect()
    assert (r.n_pair, r.n_a, r.n_b) == (2, 2, 2)
    assert r.lift_ppm == 1000000  # 2*2/(2*2)


# --------------------------------------------------------------------
# events_markov_transitions
# --------------------------------------------------------------------


def test_markov_transitions_planted(spark, tmp_path):
    # User 1: a -> b -> a -> b ; user 2: b -> b.
    # Transitions: a->b x2, b->a x1, b->b x1.
    # Row a: total 2 -> p(a->b)=1.0; row b: total 2 -> 0.5 each.
    rows = [
        (1, 1, _ts(1, 1), 1.0, "a"),
        (2, 1, _ts(1, 2), 1.0, "b"),
        (3, 1, _ts(1, 3), 1.0, "a"),
        (4, 1, _ts(1, 4), 1.0, "b"),
        (5, 2, _ts(1, 1), 1.0, "b"),
        (6, 2, _ts(1, 2), 1.0, "b"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        (r.prev_type, r.next_type): (r.n, r.p_ppm)
        for r in REG["events_markov_transitions"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("a", "b"): (2, 1000000),
        ("b", "a"): (1, 500000),
        ("b", "b"): (1, 500000),
    }


def test_markov_transitions_tie_broken_by_event_id(spark, tmp_path):
    # Two events at the SAME timestamp: event_id orders them, so the
    # chain is a -> b (not b -> a) deterministically.
    rows = [
        (1, 1, _ts(1, 1), 1.0, "a"),
        (2, 1, _ts(1, 1), 1.0, "b"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = [
        (r.prev_type, r.next_type)
        for r in REG["events_markov_transitions"].fn(spark, str(tmp_path)).collect()
    ]
    assert got == [("a", "b")]


# --------------------------------------------------------------------
# events_streaks
# --------------------------------------------------------------------


def test_streaks_planted(spark, tmp_path):
    # User 1 active days 1,2,3 then 7,8 -> longest 3.
    # User 2 active day 5 only -> longest 1.
    # User 3 active days 1,2 -> longest 2.  Histogram: {1:1, 2:1, 3:1}.
    rows = []
    eid = 0
    for u, days in ((1, [1, 2, 3, 7, 8]), (2, [5]), (3, [1, 2])):
        for d in days:
            eid += 1
            rows.append((eid, u, _ts(d), 1.0, "click"))
            # a second event the same day must not break the streak
            eid += 1
            rows.append((eid, u, _ts(d, 5), 1.0, "view"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        r.streak_len: r.n_users
        for r in REG["events_streaks"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


# --------------------------------------------------------------------
# supplier_return_rate
# --------------------------------------------------------------------


def test_supplier_return_rate_wilson(spark, tmp_path):
    # Supplier 1: 1/1 returned (rate 1.0); supplier 2: 90/100.
    # Wilson LCB must rank supplier 2 ABOVE supplier 1 despite the
    # lower raw rate — the whole point of the ranking statistic.
    rows = [(1, 10, 1, "R", 1.0, _ts(1))]
    rows += [
        (100 + i, 10, 2, ("R" if i < 90 else "N"), 1.0, _ts(1))
        for i in range(100)
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    _write(
        spark,
        tmp_path,
        "supplier",
        [(1, "one", 0, 0.0), (2, "two", 0, 0.0)],
        SUP_SCHEMA,
    )
    got = REG["supplier_return_rate"].fn(spark, str(tmp_path)).collect()
    assert [r.s_suppkey for r in got] == [2, 1]
    by = {r.s_suppkey: r for r in got}
    assert by[1].rate_ppm == 1000000 and by[2].rate_ppm == 900000
    # hand Wilson for supplier 2: p=.9, n=100, z=1.959964
    z = 1.959964
    p, n = 0.9, 100.0
    w = (p + z * z / (2 * n) - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) / (
        1 + z * z / n
    )
    assert by[2].wilson_lcb_ppm == math.floor(w * 1e6 + 0.5)


# --------------------------------------------------------------------
# embed_silhouette_simplified
# --------------------------------------------------------------------


def test_silhouette_planted_two_labels(spark, tmp_path):
    # Label 0 points at x ~ 0, label 1 points at x ~ 10 (dim 0 only):
    # tight, well-separated -> silhouette near 1 for both labels.
    def vec(x):
        v = [0.0] * 64
        v[0] = x
        return v

    rows = [
        (1, vec(0.0), 0),
        (2, vec(1.0), 0),
        (3, vec(10.0), 1),
        (4, vec(11.0), 1),
    ]
    _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    got = {
        r.label: r
        for r in REG["embed_silhouette_simplified"].fn(spark, str(tmp_path)).collect()
    }
    # label 0: centroid 0.5; a = 0.5 for both; other centroid 10.5 ->
    # b = 10.0 (point 2) / 10.5 (point 1); s = (b-a)/b.
    s1 = (10.5 - 0.5) / 10.5
    s2 = (9.5 - 0.5) / 9.5
    expect0 = math.floor(
        (math.floor(s1 * 1e4 + 0.5) + math.floor(s2 * 1e4 + 0.5)) * 100.0 / 2
    )
    assert got[0].n_members == 2
    assert got[0].silhouette_ppm == expect0
    assert got[1].silhouette_ppm == expect0  # symmetric construction


def test_silhouette_single_label_is_zero(spark, tmp_path):
    rows = [(1, [1.0] * 64, 0), (2, [2.0] * 64, 0)]
    _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    [r] = REG["embed_silhouette_simplified"].fn(spark, str(tmp_path)).collect()
    assert (r.label, r.silhouette_ppm) == (0, 0)


# --------------------------------------------------------------------
# stats_bh_fdr
# --------------------------------------------------------------------


def _phi_as(x: float) -> float:
    """A&S 26.2.19 upper-tail doubling, mirrored from the query."""
    d = (0.0498673470, 0.0211410061, 0.0032776263, 0.0000380036,
         0.0000488906, 0.0000053830)
    base = 1.0 + sum(c * x ** (i + 1) for i, c in enumerate(d))
    return 1.0 / base ** 16


def test_bh_fdr_planted(spark, tmp_path):
    # Type "shift": values 1.0 pre / 9.0 post with tiny jitter -> a
    # huge |z|, p ~ 0 -> rejected.  Type "flat": identical halves ->
    # z ~ 0, p ~ 1 -> not rejected.  m = 2.
    rows = []
    eid = 0
    for i in range(20):
        eid += 1
        rows.append((eid, 1, _ts(1 + (i % 5)), 1.0 + 0.01 * i, "shift"))
    for i in range(20):
        eid += 1
        rows.append((eid, 1, _ts(20 + (i % 5)), 9.0 + 0.01 * i, "shift"))
    for i in range(40):
        eid += 1
        rows.append((eid, 1, _ts(1 + (i % 25)), 5.0 + 0.01 * (i % 4), "flat"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {r.event_type: r for r in REG["stats_bh_fdr"].fn(spark, str(tmp_path)).collect()}
    assert got["shift"].rejected is True
    assert got["flat"].rejected is False
    assert got["shift"].p_rank == 1 and got["shift"].m == 2
    assert got["shift"].p_ppm == 0  # p far below 1e-6
    # sanity: the A&S approximation itself (one mirrored point)
    assert abs(_phi_as(1.959964) - 0.05) < 1e-3


def test_bh_fdr_degenerate_type_excluded_from_m(spark, tmp_path):
    # A type with a single event (one half has n=1, the other n=0)
    # has no z and must not count toward m.
    rows = [
        (1, 1, _ts(1), 5.0, "lonely"),
    ]
    eid = 1
    for i in range(10):
        eid += 1
        rows.append((eid, 1, _ts(1 + (i % 5)), 1.0, "shift"))
    for i in range(10):
        eid += 1
        rows.append((eid, 1, _ts(20 + (i % 5)), 9.0 + 0.01 * i, "shift"))
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = REG["stats_bh_fdr"].fn(spark, str(tmp_path)).collect()
    assert [r.event_type for r in got] == ["shift"]
    assert got[0].m == 1
