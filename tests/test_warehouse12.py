"""Planted-semantics tests for the round-6 warehouse12 batch
(latency quantiles, coverage curve, max drawdown).

Hand-computed tiny fixtures — the oracle gate can't catch a semantic
flaw mirrored into the SQL twin, these can.
"""

from __future__ import annotations

import datetime

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture


def test_orders_ship_latency_by_priority_planted(spark, tmp_path):
    d = datetime.datetime
    _write(
        spark, tmp_path, "orders",
        [(1, "1-URGENT", d(2020, 1, 1)), (2, "1-URGENT", d(2020, 1, 1))],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    )
    # latencies: order 1 -> 2 and 4 days; order 2 -> 10 days
    _write(
        spark, tmp_path, "lineitem",
        [
            (1, d(2020, 1, 3)),
            (1, d(2020, 1, 5)),
            (2, d(2020, 1, 11)),
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    [r] = REG["orders_ship_latency_by_priority"].fn(
        spark, str(tmp_path)
    ).collect()
    # sorted latencies [2, 4, 10]: p50 = 4; p90 interpolates between
    # 4 and 10 at 0.8 -> 8.8; p99 -> 9.88
    assert (r.o_orderpriority, r.n_lines) == ("1-URGENT", 3)
    assert r.p50_milli_days == 4000
    assert r.p90_milli_days == 8800
    assert r.p99_milli_days == 9880


def test_text_ngram_coverage_curve_planted(spark, tmp_path):
    # counts: a x6, b x3, c x1 -> total 10
    rows = [(1, "a a a a a a b b b c", "s")]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, source string",
    )
    out = {
        r.k: (r.n_vocab_used, r.coverage_ppm)
        for r in REG["text_ngram_coverage_curve"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    # k=1 -> a: 600000 ; k=2 -> a+b: 900000 ; k>=4 caps at |V|=3
    assert out[1] == (1, 600000)
    assert out[2] == (2, 900000)
    for k in (4, 8, 16, 32, 64):
        assert out[k] == (3, 1000000)


def test_events_max_drawdown_planted(spark, tmp_path):
    d = datetime.datetime
    rows = []
    eid = 0
    # type A days 1..5: 5, 2, 4, 1, 3 -> peak stays 5;
    # drawdowns: 0,3,1,4,2 -> max 4 on day 4
    for day, n in [(1, 5), (2, 2), (3, 4), (4, 1), (5, 3)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, d(2020, 1, day, 12), "A"))
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, event_type string",
    )
    [r] = REG["events_max_drawdown"].fn(spark, str(tmp_path)).collect()
    assert (r.event_type, r.max_drawdown, r.peak_cnt, r.trough_day) == (
        "A", 4, 5, "2020-01-04"
    )


def test_events_max_drawdown_earliest_tie(spark, tmp_path):
    d = datetime.datetime
    rows = []
    eid = 0
    # days 1..4: 3, 1, 2, 1 -> drawdown 2 on day 2 AND day 4; the
    # EARLIEST day must win the tie
    for day, n in [(1, 3), (2, 1), (3, 2), (4, 1)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, d(2020, 1, day, 12), "A"))
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, event_type string",
    )
    [r] = REG["events_max_drawdown"].fn(spark, str(tmp_path)).collect()
    assert (r.max_drawdown, r.trough_day) == (2, "2020-01-02")
