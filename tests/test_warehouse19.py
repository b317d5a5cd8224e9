"""Planted-semantics tests for the round-6 warehouse19 batch
(hapax ratio, monthly status mix)."""

from __future__ import annotations

import datetime

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture


def test_text_hapax_ratio_planted(spark, tmp_path):
    rows = [
        # source s vocabulary: aa x3, bb x1, cc x1 -> 2 of 3 hapax
        (1, "aa bb aa", "s"),
        (2, "aa cc", "s"),
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, source string",
    )
    [r] = REG["text_hapax_ratio"].fn(spark, str(tmp_path)).collect()
    assert (r.source, r.n_types, r.n_hapax) == ("s", 3, 2)
    assert r.hapax_ppm == 666666


def test_orders_status_mix_by_month_planted(spark, tmp_path):
    d = datetime.datetime
    rows = [
        (1, "O", d(2020, 1, 5)),
        (2, "O", d(2020, 1, 9)),
        (3, "F", d(2020, 1, 20)),
        (4, "F", d(2020, 2, 1)),
    ]
    _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_orderstatus string, o_orderdate timestamp",
    )
    out = {
        (r.month, r.o_orderstatus): (r.n_orders, r.share_ppm)
        for r in REG["orders_status_mix_by_month"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {
        ("2020-01", "O"): (2, 666666),
        ("2020-01", "F"): (1, 333333),
        ("2020-02", "F"): (1, 1000000),
    }
