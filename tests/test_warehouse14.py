"""Planted-semantics tests for the round-6 warehouse14 batch
(MinHash accuracy, dow-hour heatmap, inter-arrival CV).

Hand-computed tiny fixtures — the oracle gate can't catch a semantic
flaw mirrored into the SQL twin, these can.
"""

from __future__ import annotations

import datetime
import hashlib

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 32


def test_dedup_minhash_accuracy_planted(spark, tmp_path):
    # two identical docs in the same md5 bucket: exact J = 1.0 and
    # every permutation min matches -> est = 1.0 -> error 0 in band 10
    ids, b0 = [], None
    for i in range(1, 300):
        b = _bucket(i)
        if b0 is None:
            b0, ids = b, [i]
        elif b == b0:
            ids.append(i)
            if len(ids) == 2:
                break
    text = "alpha beta gamma delta epsilon zeta"
    rows = [(ids[0], text, "s"), (ids[1], text, "s")]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, source string",
    )
    [r] = REG["dedup_minhash_accuracy"].fn(spark, str(tmp_path)).collect()
    assert (r.band, r.n_pairs) == (10, 1)  # exact_milli = 1000
    assert r.mean_err_milli == 0 and r.max_err_milli == 0


def test_dedup_minhash_accuracy_disjoint(spark, tmp_path):
    # same-bucket pair with NO shared shingles: exact J = 0; the
    # estimate can only exceed by chance min-collisions (unlikely
    # with distinct vocab) -> band 0
    ids, b0 = [], None
    for i in range(1, 300):
        b = _bucket(i)
        if b0 is None:
            b0, ids = b, [i]
        elif b == b0:
            ids.append(i)
            if len(ids) == 2:
                break
    rows = [
        (ids[0], "aa bb cc dd ee", "s"),
        (ids[1], "ff gg hh ii jj", "s"),
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, source string",
    )
    [r] = REG["dedup_minhash_accuracy"].fn(spark, str(tmp_path)).collect()
    assert (r.band, r.n_pairs) == (0, 1)


def test_events_dow_hour_heatmap_planted(spark, tmp_path):
    d = datetime.datetime
    rows = [
        # 2020-01-06 is a Monday -> dow 0
        (1, d(2020, 1, 6, 9, 30)),
        (2, d(2020, 1, 6, 9, 45)),
        # 2020-01-12 is a Sunday -> dow 6
        (3, d(2020, 1, 12, 23, 5)),
    ]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp",
    )
    out = {
        (r.dow, r.hour): (r.n_events, r.share_ppm)
        for r in REG["events_dow_hour_heatmap"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {
        (0, 9): (2, 666666),
        (6, 23): (1, 333333),
    }


def test_orders_interarrival_cv_planted(spark, tmp_path):
    d = datetime.datetime
    # customer 1 (segment A): orders on days 1, 3, 5 -> gaps [2, 2]
    # -> variance 0 -> CV 0
    _write(
        spark, tmp_path, "orders",
        [
            (1, 1, d(2020, 1, 1)),
            (2, 1, d(2020, 1, 3)),
            (3, 1, d(2020, 1, 5)),
            # customer 2 (segment B): gaps [1, 3] -> mean 2, pop var
            # ((1-2)^2 + (3-2)^2)/2 = 1 -> CV = 0.5
            (4, 2, d(2020, 1, 1)),
            (5, 2, d(2020, 1, 2)),
            (6, 2, d(2020, 1, 5)),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    _write(
        spark, tmp_path, "customer",
        [(1, "A"), (2, "B")],
        "c_custkey long, c_mktsegment string",
    )
    out = {
        r.c_mktsegment: (r.n_gaps, r.total_gap_days, r.cv_milli)
        for r in REG["orders_interarrival_cv"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {"A": (2, 4, 0), "B": (2, 4, 500)}
