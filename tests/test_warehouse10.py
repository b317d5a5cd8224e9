"""Planted-semantics tests for the round-6 warehouse10 batch
(forecast backtest, local bridges, augmentation plan, code
detection).

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


def test_events_forecast_backtest_planted(spark, tmp_path):
    d = datetime.datetime
    rows = []
    eid = 0
    # type A: day 1 -> 2 events, day 8 -> 3 events, day 9 -> 1 event
    for day, n in [(1, 2), (8, 3), (9, 1)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, d(2020, 1, day, 12), "A"))
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, event_type string",
    )
    [r] = REG["events_forecast_backtest"].fn(spark, str(tmp_path)).collect()
    # spine days 1..9; evaluated days 8..9 (need day-7 inside spine):
    # day 8: |3 - cnt(day1)=2| = 1 ; day 9: |1 - cnt(day2)=0| = 1
    assert (r.event_type, r.n_days, r.total_abs_err) == ("A", 2, 2)
    assert r.mae_milli == 1000  # 2/2 = 1.000


def test_graph_local_bridges_planted(spark, tmp_path):
    # triangle 1-2-3 (no bridges) plus pendant edge 3-4 (a bridge)
    rows = []
    ok = 0
    for a, b in [(1, 2), (2, 3), (1, 3), (3, 4)]:
        for _ in range(2):  # support 2
            ok += 1
            rows += [(ok, a), (ok, b)]
    _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long",
    )
    out = [
        (r.pa, r.pb)
        for r in REG["graph_local_bridges"].fn(spark, str(tmp_path)).collect()
    ]
    assert out == [(3, 4)]


def test_multimodal_augmentation_plan_planted(spark, tmp_path):
    rows = [(7, [0.0] * 64, 0)]
    _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    [r] = REG["multimodal_augmentation_plan"].fn(
        spark, str(tmp_path)
    ).collect()
    h = int(hashlib.md5(b"7").hexdigest()[:15], 16)
    assert (r.flip, r.crop_x, r.crop_y) == (
        h % 2, (h // 2) % 32, (h // 64) % 32
    )
    assert r.rotation_deg == ((h // 2048) % 4) * 90
    assert r.brightness_ppm == 900000 + (h // 8192) % 200000


def test_text_code_detection_planted(spark, tmp_path):
    code = "def f(x):\n    return x*2; # {}"   # symbols + keywords
    prose = "plain words and nothing more here"
    rows = [(1, code, "s"), (2, prose, "s")]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: (r.n_syms, r.n_kw, r.code_score_ppm, r.is_code)
        for r in REG["text_code_detection"].fn(spark, str(tmp_path)).collect()
    }
    # code doc: syms {}();=# -> '(' ')' ':'? no colon in set; count by
    # hand over "{}();=[]<>#": ( ) ; = { } # -> 7 ; keywords: def,
    # return -> 2
    n_syms = sum(1 for ch in code if ch in "{}();=[]<>#")
    score = (n_syms * 1000000) // (len(code) + 1) + 2 * 10000
    assert out[1] == (n_syms, 2, score, score >= 30000)
    assert out[1][3] is True
    assert out[2] == (0, 0, 0, False)
