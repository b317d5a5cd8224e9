"""Planted-semantics tests for the round-6 warehouse6 batch
(Kaplan-Meier survival, Holt linear smoothing, vocab OOV, 2-hop
reach).

Hand-computed tiny fixtures — the oracle gate can't catch a semantic
flaw mirrored into the SQL twin, these can.
"""

from __future__ import annotations

import datetime
import math

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture


def _order(k, cust, day):
    return (k, cust, datetime.datetime(2020, 1, day))


def test_orders_survival_km_planted(spark, tmp_path):
    rows = [
        # cust 1: repeat after 2 days (event at dur 2)
        _order(1, 1, 1), _order(2, 1, 3),
        # cust 2: repeat after 2 days (event at dur 2)
        _order(3, 2, 2), _order(4, 2, 4),
        # cust 3: repeat after 5 days (event at dur 5)
        _order(5, 3, 1), _order(6, 3, 6),
        # cust 4: single order on day 4, censored at max date (day 6)
        _order(7, 4, 4),
    ]
    _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    out = {
        r.duration_days: (r.n_risk, r.n_events, r.surv_ppm)
        for r in REG["orders_survival_km"].fn(spark, str(tmp_path)).collect()
    }
    # durations: 2 (d=2), 2 (censor dur for cust4), 5 (d=1)
    # dur 2: n_risk 4, d 2 -> S = 1/2
    # cust4 censored at dur 2 as well (day4 -> day6): c=1 at dur 2
    # dur 5: n_risk 1, d 1 -> everyone-died flag -> S = 0
    s2 = math.floor(
        math.exp(math.floor(math.log(1 - 2 / 4) * 1e9) / 1e9) * 1e6
    )
    assert out == {2: (4, 2, s2), 5: (1, 1, 0)}
    assert s2 in (499999, 500000)  # = 0.5 up to the nano quantization


def test_events_holt_linear_planted(spark, tmp_path):
    d = datetime.datetime
    # type A: day1 x1, day2 x3, day3 x2 -> y = [1, 3, 2]
    rows = []
    eid = 0
    for day, n in [(1, 1), (2, 3), (3, 2)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, d(2020, 1, day, 12, 0), "A"))
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, event_type string",
    )
    [r] = REG["events_holt_linear"].fn(spark, str(tmp_path)).collect()
    # hand fold, alpha=.5 beta=.3: l=1, b=2
    # t2: l=.5*3+.5*(1+2)=3.0 ; b=.3*(3-1)+.7*2=2.0
    # t3: l=.5*2+.5*(3+2)=3.5 ; b=.3*(3.5-3)+.7*2=1.55
    assert (r.event_type, r.n_days) == ("A", 3)
    # exact float replay of the fold (b lands at 1.54999..., not 1.55)
    lv, b = 1.0, 2.0
    for y in [3.0, 2.0]:
        ln_ = 0.5 * y + 0.5 * (lv + b)
        b = 0.3 * (ln_ - lv) + 0.7 * b
        lv = ln_
    assert (lv, math.floor(b * 1000)) == (3.5, 1549)
    assert r.level_milli == math.floor(lv * 1000)
    assert r.trend_milli == math.floor(b * 1000)
    assert r.forecast7_milli == math.floor((lv + 7.0 * b) * 1000)


def test_text_vocab_oov_planted(spark, tmp_path, monkeypatch):
    import rc_scanner_spark.queries.warehouse6 as w6

    monkeypatch.setattr(w6, "_VOCAB_K", 2)
    rows = [
        # corpus counts: aa x3, bb x2, cc x1 -> vocab (K=2) = {aa, bb}
        (1, "aa bb aa", "s"),
        (2, "aa bb cc", "s"),
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_ppm)
        for r in REG["text_vocab_oov"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {1: (3, 0, 0), 2: (3, 1, 333333)}


def test_graph_reach_2hop_planted(spark, tmp_path):
    # path graph 1-2-3-4 via co-purchase baskets (support >= 2 needs
    # each edge in two orders; _TRI_MAX_ORDER caps basket size).
    rows = []
    ok = 0
    for a, b in [(1, 2), (2, 3), (3, 4)]:
        for _ in range(2):  # support 2
            ok += 1
            rows += [(ok, a), (ok, b)]
    _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long",
    )
    out = {
        r.node: (r.degree, r.reach2)
        for r in REG["graph_reach_2hop"].fn(spark, str(tmp_path)).collect()
    }
    # exactly-2-hop sets: 1->{3}, 2->{4}, 3->{1}, 4->{2}
    assert out == {1: (1, 1), 2: (2, 1), 3: (2, 1), 4: (1, 1)}
