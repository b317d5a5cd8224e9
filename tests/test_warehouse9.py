"""Planted-semantics tests for the round-6 warehouse9 batch
(ABC classification, sliding HLL, partition checksums).

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


def test_orders_abc_classification_planted(spark, tmp_path):
    # one type, revenues 80 / 15 / 5 cents: exact class edges — the
    # 80-cent part must be A (cum*100 == total*80), 15-cent B (95%),
    # 5-cent C.
    li = [
        (1, 0.80, 0.0),
        (2, 0.15, 0.0),
        (3, 0.05, 0.0),
    ]
    _write(
        spark, tmp_path, "lineitem", li,
        "l_partkey long, l_extendedprice double, l_discount double",
    )
    _write(
        spark, tmp_path, "part",
        [(1, "T"), (2, "T"), (3, "T")],
        "p_partkey long, p_type string",
    )
    out = {
        (r.p_type, r.abc_class): (r.n_parts, r.revenue_cents)
        for r in REG["orders_abc_classification"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {
        ("T", "A"): (1, 80),
        ("T", "B"): (1, 15),
        ("T", "C"): (1, 5),
    }


def test_sketch_hll_sliding_planted(spark, tmp_path):
    d = datetime.datetime
    # users 1,2 on day 1; user 3 on day 9 (outside day 1's window,
    # day 1 outside day 9's trailing window)
    rows = [
        (1, d(2020, 1, 1, 10), 1),
        (2, d(2020, 1, 1, 11), 2),
        (3, d(2020, 1, 9, 10), 3),
    ]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long",
    )
    out = {
        r.day: (r.exact_users_7d, r.approx_ok)
        for r in REG["sketch_hll_sliding"].fn(spark, str(tmp_path)).collect()
    }
    # day 1 window: users {1,2}; day 9 window (Jan 3..9): {3} only
    assert out == {
        "2020-01-01": (2, True),
        "2020-01-09": (1, True),
    }


def test_profile_partition_checksums_planted(spark, tmp_path):
    rows = [
        (1, "aa", "s"),
        (2, "bb", "s"),
        (3, "cc", "t"),
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, source string",
    )
    out = {
        r.source: (r.n_rows, r.xor_checksum, r.modsum_checksum)
        for r in REG["profile_partition_checksums"]
        .fn(spark, str(tmp_path))
        .collect()
    }

    def h(doc_id, text):
        return int(
            hashlib.md5(f"{doc_id}\x01{text}".encode()).hexdigest()[:15], 16
        )

    h1, h2, h3 = h(1, "aa"), h(2, "bb"), h(3, "cc")
    assert out == {
        "s": (2, h1 ^ h2, (h1 + h2) % (16 ** 15)),
        "t": (1, h3, h3 % (16 ** 15)),
    }
    # order independence: reversed write produces identical sums
    _write(
        spark, tmp_path, "documents", rows[::-1],
        "doc_id long, text string, source string",
    )
    out2 = {
        r.source: (r.n_rows, r.xor_checksum, r.modsum_checksum)
        for r in REG["profile_partition_checksums"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out2 == out


def test_profile_partition_checksums_null_text(spark, tmp_path):
    import hashlib as _hl

    rows = [(1, None, "s")]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, source string",
    )
    [r] = REG["profile_partition_checksums"].fn(
        spark, str(tmp_path)
    ).collect()
    # NULL text hashes as '' by explicit contract on both engines
    h = int(_hl.md5("1\x01".encode()).hexdigest()[:15], 16)
    assert (r.n_rows, r.xor_checksum) == (1, h)
