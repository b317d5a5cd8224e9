"""Planted-semantics tests for the round-6 warehouse4 batch
(global sequence, Theil-Sen trend, Benford profile, JL projection).

Hand-computed tiny fixtures — the oracle gate can't catch a semantic
flaw mirrored into the SQL twin, these can.
"""

from __future__ import annotations

import datetime
import hashlib
import math

from rc_scanner_spark.queries import build_registry
from rc_scanner_spark.queries.warehouse4 import _jl_matrix, _BENFORD_PPM

REG = build_registry()


from tests.conftest import write_fixture

_write = write_fixture


def test_seq_global_row_number_planted(spark, tmp_path):
    d = datetime.datetime
    rows = [
        # day 1: tie at 10:00 broken by event_id (1 before 3), then 11:00
        (3, d(2020, 1, 1, 10, 0)),
        (1, d(2020, 1, 1, 10, 0)),
        (2, d(2020, 1, 1, 11, 0)),
        # day 2: ts order (5 at 01:00 precedes 4 at 02:00) beats id order
        (5, d(2020, 1, 2, 1, 0)),
        (4, d(2020, 1, 2, 2, 0)),
        # NULL ts: excluded from sequencing by contract (both sides)
        (9, None),
    ]
    _write(spark, tmp_path, "events", rows, "event_id long, ts timestamp")
    out = REG["seq_global_row_number"].fn(spark, str(tmp_path)).collect()
    assert {(r.event_id, r.seq) for r in out} == {
        (1, 1),
        (3, 2),
        (2, 3),
        (5, 4),
        (4, 5),
    }


def test_events_theilsen_trend_planted(spark, tmp_path):
    d = datetime.datetime
    rows = []
    # type A daily counts: day1=1, day2=3, day3=2
    # pair slopes: (d1,d2)=2.0, (d1,d3)=0.5, (d2,d3)=-1.0 -> median 0.5
    eid = 0
    for day, n in [(1, 1), (2, 3), (3, 2)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, d(2020, 1, day, 12, 0), "A"))
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, event_type string",
    )
    out = REG["events_theilsen_trend"].fn(spark, str(tmp_path)).collect()
    assert [(r.event_type, r.slope_ppm, r.n_pairs) for r in out] == [
        ("A", 500000, 3)
    ]


def test_profile_benford_planted(spark, tmp_path):
    rows = [
        (1, 10.00),    # cents 1000   -> digit 1
        (2, 25.50),    # cents 2550   -> digit 2
        (3, 999.995),  # cents 100000 -> digit 1 (round-half-up at cents)
        (4, 3.00),     # cents 300    -> digit 3
    ]
    _write(spark, tmp_path, "orders", rows, "o_orderkey long, o_totalprice double")
    out = REG["profile_benford"].fn(spark, str(tmp_path)).collect()
    got = [(r.digit, r.obs, r.obs_ppm, r.expected_ppm, r.dev_ppm) for r in out]
    assert got == [
        (1, 2, 500000, 301030, 198970),
        (2, 1, 250000, 176091, 73909),
        (3, 1, 250000, 124939, 125061),
    ]
    # the embedded expectation table matches a fresh computation
    assert _BENFORD_PPM[1] == 301030
    assert _BENFORD_PPM == {
        k: int(math.floor(math.log10(1 + 1 / k) * 1e6 + 0.5))
        for k in range(1, 10)
    }


def test_embed_random_projection_planted(spark, tmp_path):
    # e0 unit vector picks out matrix row 0; zero vector -> all zeros
    e0 = [1.0] + [0.0] * 63
    z = [0.0] * 64
    _write(
        spark, tmp_path, "embeddings",
        [(1, e0, "a"), (2, z, "b")],
        "vec_id long, embedding array<float>, label string",
    )
    out = REG["embed_random_projection"].fn(spark, str(tmp_path)).collect()
    m = _jl_matrix()
    exp_row0 = [
        int(math.floor((m[0][j] / 1000000.0) * 1000000.0 + 0.5))
        for j in range(8)
    ]
    assert [out[0][f"p{j}"] for j in range(8)] == exp_row0
    assert [out[1][f"p{j}"] for j in range(8)] == [0] * 8


def test_agg_incremental_merge_planted(spark, tmp_path):
    d = datetime.datetime
    # max day = Jan 10 -> cutoff Jan 3: A straddles the cutoff,
    # B is snapshot-only, C is delta-only — the merge must cover all.
    rows = [
        (1, d(2020, 1, 1, 1), "A", 1.00),   # snap
        (2, d(2020, 1, 2, 1), "A", 2.50),   # snap
        (3, d(2020, 1, 9, 1), "A", 0.25),   # delta
        (4, d(2020, 1, 1, 1), "B", 10.00),  # snap only
        (5, d(2020, 1, 10, 1), "C", 4.00),  # delta only
        (6, None, "C", 1.00),               # NULL ts -> delta branch
    ]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, event_type string, value double",
    )
    out = REG["agg_incremental_merge"].fn(spark, str(tmp_path)).collect()
    got = [
        (r.event_type, r.n_events, r.sum_cents, r.min_cents, r.max_cents,
         r.avg_cents)
        for r in out
    ]
    assert got == [
        ("A", 3, 375, 25, 250, 125),
        ("B", 1, 1000, 1000, 1000, 1000),
        ("C", 2, 500, 100, 400, 250),
    ]


def test_events_dow_seasonality_planted(spark, tmp_path):
    d = datetime.datetime
    # 2020-01-06 is a Monday (dow 0), 2020-01-07 Tuesday (dow 1)
    rows = [
        (1, d(2020, 1, 6, 1), "A"),
        (2, d(2020, 1, 6, 2), "A"),
        (3, d(2020, 1, 6, 3), "A"),
        (4, d(2020, 1, 7, 1), "A"),
    ]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, event_type string",
    )
    out = REG["events_dow_seasonality"].fn(spark, str(tmp_path)).collect()
    assert [(r.event_type, r.dow, r.n, r.share_ppm, r.dev_ppm) for r in out] == [
        ("A", 0, 3, 750000, 607143),
        ("A", 1, 1, 250000, 107143),
    ]


def test_text_keyword_tagging_planted(spark, tmp_path):
    rows = [
        (1, "spark JOIN spark table"),   # spark x2 (1 doc), join x1
        (2, "join the stream"),          # join x1, stream x1
        (3, "nothing relevant here"),
    ]
    _write(spark, tmp_path, "documents", rows, "doc_id long, text string")
    out = REG["text_keyword_tagging"].fn(spark, str(tmp_path)).collect()
    assert [(r.keyword, r.doc_freq, r.occurrences) for r in out] == [
        ("join", 2, 2),
        ("spark", 1, 2),
        ("stream", 1, 1),
    ]


def test_embed_pca_variance_planted(spark, tmp_path):
    # axis-0 spread 2x the axis-1 spread: eigenvalues 2.0 and 0.5,
    # all other components zero -> shares 800000 / 200000 ppm.
    def vec(i, v):
        out = [0.0] * 64
        out[i] = v
        return out

    rows = [
        (1, vec(0, 2.0), "a"),
        (2, vec(0, -2.0), "a"),
        (3, vec(1, 1.0), "b"),
        (4, vec(1, -1.0), "b"),
    ]
    _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label string",
    )
    out = REG["embed_pca_variance"].fn(spark, str(tmp_path)).collect()
    got = [(r.component, r.evr_ppm, r.cum_ppm) for r in out]
    assert got[0] == (0, 800000, 800000)
    assert got[1] == (1, 200000, 1000000)
    assert all(ppm == 0 for _, ppm, _ in got[2:])
    assert len(got) == 8


def test_graph_label_propagation_planted(spark, tmp_path):
    # Components: triangle {1,2,3} + pendant 4 -> all converge to 1;
    # triangle {10,11,12} -> 10; star+edge {20..23} -> 20, where the
    # round-2/3 updates of node 20 exercise a GENUINE mode win
    # (label 20 outvotes 21 two-to-one), not just the min tie-break.
    edges = [
        (1, 2), (1, 3), (2, 3), (3, 4),
        (10, 11), (10, 12), (11, 12),
        (20, 21), (20, 22), (20, 23), (21, 22),
    ]
    rows = []
    okey = 0
    for a, b in edges:  # each pair co-occurs in 2 orders (support >= 2)
        for _ in range(2):
            okey += 1
            rows.append((okey, a))
            rows.append((okey, b))
    _write(
        spark, tmp_path, "lineitem", rows, "l_orderkey long, l_partkey long"
    )
    out = REG["graph_label_propagation"].fn(spark, str(tmp_path)).collect()
    assert [(r.community, r.n_members, r.min_member) for r in out] == [
        (1, 4, 1),
        (10, 3, 10),
        (20, 4, 20),
    ]


def test_text_inverted_index_planted(spark, tmp_path):
    rows = [
        (1, "a a b"),
        (2, "a b b b"),
        (3, "c"),
    ]
    _write(spark, tmp_path, "documents", rows, "doc_id long, text string")
    out = REG["text_inverted_index"].fn(spark, str(tmp_path)).collect()
    assert [(r.term, r.df, r.total_tf, r.top_docs) for r in out] == [
        ("a", 2, 3, "1:2,2:1"),
        ("b", 2, 4, "2:3,1:1"),
        ("c", 1, 1, "3:1"),
    ]


def test_split_kfold_planted(spark, tmp_path):
    rows = [(i, 10 * i) for i in range(1, 21)]
    _write(spark, tmp_path, "documents", rows, "doc_id long, n_chars long")
    out = REG["split_kfold"].fn(spark, str(tmp_path)).collect()
    # replay the fold assignment in pure python
    folds = {}
    for i, nc in rows:
        f = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 5
        folds.setdefault(f, [0, 0])
        folds[f][0] += 1
        folds[f][1] += nc
    all_docs = sum(v[0] for v in folds.values())
    all_chars = sum(v[1] for v in folds.values())
    got = {
        r.fold: (r.test_docs, r.test_chars, r.train_docs, r.train_chars)
        for r in out
    }
    assert got == {
        f: (n, c, all_docs - n, all_chars - c)
        for f, (n, c) in folds.items()
    }


def test_embed_pair_distance_hist_planted(spark, tmp_path):
    # find three ids in the SAME md5-mod-64 bucket, plus a zero vector
    # (same bucket) that must be excluded by the norm filter
    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 64

    ids = []
    i = 1
    target = bucket(1)
    while len(ids) < 4:
        if bucket(i) == target:
            ids.append(i)
        i += 1

    def vec(axis, v=1.0):
        out = [0.0] * 64
        if axis is not None:
            out[axis] = v
        return out

    rows = [
        (ids[0], vec(0), "a"),       # e0
        (ids[1], vec(0), "a"),       # e0 again -> cos 1 with ids[0]
        (ids[2], vec(1), "b"),       # e1 -> cos 0 with both
        (ids[3], vec(None), "z"),    # zero vector -> excluded
    ]
    _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label string",
    )
    out = REG["embed_pair_distance_hist"].fn(spark, str(tmp_path)).collect()
    # pairs: (e0,e0) cos=1 -> bin 20; (e0,e1) x2 cos=0 -> bin 0
    assert [(r.bin, r.n_pairs, r.share_ppm) for r in out] == [
        (0, 2, 666666),
        (20, 1, 333333),
    ]


def test_jl_matrix_deterministic_and_centered():
    m = _jl_matrix()
    assert len(m) == 64 and all(len(r) == 8 for r in m)
    # derivation pinned: md5-based, no RNG state
    expect00 = (
        int(hashlib.md5(b"rp_0_0").hexdigest()[:15], 16) % 2000001 - 1000000
    )
    assert m[0][0] == expect00
    flat = [x for r in m for x in r]
    assert all(-1000000 <= x <= 1000000 for x in flat)
    # roughly centered (uniform over [-1e6, 1e6]; loose sanity bound)
    assert abs(sum(flat) / len(flat)) < 200000
