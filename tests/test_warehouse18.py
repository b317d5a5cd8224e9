"""Planted-semantics tests for the round-6 warehouse18 batch
(degree assortativity, word-length profile).

Hand-computed tiny fixtures — the oracle gate can't catch a semantic
flaw mirrored into the SQL twin, these can.
"""

from __future__ import annotations

import math

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture


def test_graph_degree_assortativity_star(spark, tmp_path):
    # star 1-{2,3,4}: every edge joins deg 3 with deg 1 ->
    # perfectly disassortative, r = -1
    rows = []
    ok = 0
    for a, b in [(1, 2), (1, 3), (1, 4)]:
        for _ in range(2):  # support 2
            ok += 1
            rows += [(ok, a), (ok, b)]
    _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long",
    )
    [r] = REG["graph_degree_assortativity"].fn(spark, str(tmp_path)).collect()
    assert r.n_edge_endpoints == 6  # 3 edges x 2 orientations
    assert r.assortativity_milli == -1000


def test_graph_degree_assortativity_degenerate(spark, tmp_path):
    # single edge: both endpoints deg 1 -> zero variance -> NULL
    rows = [(1, 1), (1, 2), (2, 1), (2, 2)]
    _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long",
    )
    [r] = REG["graph_degree_assortativity"].fn(spark, str(tmp_path)).collect()
    assert r.assortativity_milli is None


def test_text_word_length_profile_planted(spark, tmp_path):
    rows = [
        # lengths: 2, 2, 8 -> mean 4.0, pop var = ((2-4)^2*2+(8-4)^2)/3
        # = 8 -> std = 2.8284...; one long word of 3 -> 333333 ppm
        (1, "ab cd abcdefgh", "s"),
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, source string",
    )
    [r] = REG["text_word_length_profile"].fn(spark, str(tmp_path)).collect()
    assert (r.source, r.n_tokens) == ("s", 3)
    assert r.mean_len_milli == 4000
    assert r.std_len_milli == math.floor(math.sqrt(8.0) * 1000)
    assert r.long_word_ppm == 333333
