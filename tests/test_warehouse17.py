"""Planted-semantics tests for the round-6 warehouse17 batch
(char entropy, threshold suggestion).

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


def test_text_char_entropy_planted(spark, tmp_path):
    rows = [
        (1, "aaaa", "s"),      # constant -> 0 bits
        (2, "abab", "s"),      # two equiprobable chars -> 1 bit
        (3, "abcd", "s"),      # four equiprobable chars -> 2 bits
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: (r.n_chars_total, r.n_distinct_chars, r.entropy_millibits)
        for r in REG["text_char_entropy"].fn(spark, str(tmp_path)).collect()
    }
    assert out[1] == (4, 1, 0)
    # replay the nano quantization: term = floor(2*ln(2)*1e9) twice
    t2 = math.floor(2 * math.log(2.0) * 1e9)
    h2 = math.floor(
        (4.0 * math.log(4.0) - (2 * t2) / 1e9)
        / (4.0 * 0.6931471805599453) * 1000.0
    )
    assert out[2] == (4, 2, h2)
    assert 999 <= h2 <= 1000  # ~1 bit
    t4 = math.floor(1 * math.log(1.0) * 1e9)  # = 0
    h4 = math.floor(
        (4.0 * math.log(4.0) - (4 * t4) / 1e9)
        / (4.0 * 0.6931471805599453) * 1000.0
    )
    assert out[3] == (4, 4, h4)
    assert 1999 <= h4 <= 2000  # ~2 bits


def test_events_threshold_suggest_planted(spark, tmp_path):
    d = datetime.datetime(2020, 1, 1)
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    rows = [(i + 1, d, "A", v) for i, v in enumerate(vals)]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, event_type string, value double",
    )
    [r] = REG["events_threshold_suggest"].fn(spark, str(tmp_path)).collect()
    # median 3; deviations [2,1,0,1,97] -> MAD = 1
    # p99 interpolates between 4 and 100 at 0.96: 4 + 0.96*96 = 96.16
    p99 = 4.0 + 0.96 * 96.0
    assert (r.event_type, r.n_events) == ("A", 5)
    assert r.mad_milli == 1000
    assert r.p99_milli == math.floor(p99 * 1000)
    assert r.threshold_milli == math.floor((p99 + 3.0 * 1.0) * 1000)
