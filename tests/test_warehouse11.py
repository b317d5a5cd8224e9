"""Planted-semantics tests for the round-6 warehouse11 batch
(bipartite HITS, rejection funnel, local peaks).

Hand-computed tiny fixtures — the oracle gate can't catch a semantic
flaw mirrored into the SQL twin, these can.
"""

from __future__ import annotations

import datetime

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture


def test_graph_hits_bipartite_planted(spark, tmp_path):
    # baskets: o1={1,2}, o2={1,3}, o3={1}
    rows = [(1, 1), (1, 2), (2, 1), (2, 3), (3, 1)]
    _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long",
    )
    out = {
        r.l_partkey: (r.a1, r.a2)
        for r in REG["graph_hits_bipartite"].fn(spark, str(tmp_path)).collect()
    }
    # a1: p1=3, p2=1, p3=1
    # h1: o1 = 3+1 = 4, o2 = 3+1 = 4, o3 = 3
    # a2: p1 = 4+4+3 = 11, p2 = 4, p3 = 4
    assert out == {1: (3, 11), 2: (1, 4), 3: (1, 4)}


def test_filter_rejection_funnel_planted(spark, tmp_path):
    long = "x" * 150
    rows = [
        (1, "short", "en", "s", 5),           # 1_too_short
        (2, long, "zz", "s", 150),            # 2_non_target_lang
        (3, long, "en", "s", 150),            # 4_pass (first of dup)
        (4, long, "en", "s", 150),            # 3_exact_dup (same text)
        (5, long + "y", "en", "s", 151),      # 4_pass
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {
        (r.source, r.rule): r.n_docs
        for r in REG["filter_rejection_funnel"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {
        ("s", "1_too_short"): 1,
        ("s", "2_non_target_lang"): 1,
        ("s", "3_exact_dup"): 1,
        ("s", "4_pass"): 2,
    }
    assert sum(out.values()) == 5  # the funnel sums to the corpus


def test_filter_rejection_funnel_rule_order(spark, tmp_path):
    # a SHORT duplicate must be attributed to too_short, not dup
    rows = [
        (1, "dup", "en", "s", 3),
        (2, "dup", "en", "s", 3),
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {
        (r.source, r.rule): r.n_docs
        for r in REG["filter_rejection_funnel"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {("s", "1_too_short"): 2}


def test_events_local_peaks_planted(spark, tmp_path):
    d = datetime.datetime
    rows = []
    eid = 0
    # type A daily counts over days 1..5: 1, 3, 2, 2, 5
    # peaks: day 2 (3 > 1 and 3 > 2); day 5 is an edge -> not a peak
    for day, n in [(1, 1), (2, 3), (3, 2), (4, 2), (5, 5)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, d(2020, 1, day, 12), "A"))
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, event_type string",
    )
    out = [
        (r.event_type, r.day, r.cnt)
        for r in REG["events_local_peaks"].fn(spark, str(tmp_path)).collect()
    ]
    assert out == [("A", "2020-01-02", 3)]


def test_filter_rejection_funnel_null_lang(spark, tmp_path):
    # NULL lang must fail the language gate, not fall through to pass
    long = "y" * 150
    rows = [(1, long, None, "s", 150)]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {
        (r.source, r.rule): r.n_docs
        for r in REG["filter_rejection_funnel"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {("s", "2_non_target_lang"): 1}
