"""Planted-semantics tests for the round-6 warehouse3 batch.

Every expectation is hand-computed on a tiny fixture written into
tmp_path (same <name>.parquet convention as the sf dirs) — the oracle
gate can't catch a semantic flaw mirrored into the SQL twin, these
can.
"""

from __future__ import annotations

import datetime
import hashlib
import math

from pyspark.sql import functions as F

from rc_scanner_spark.queries import build_registry

REG = build_registry()


from tests.conftest import write_fixture

_write = write_fixture


def _ts(s):
    return datetime.datetime.fromtimestamp(s, datetime.timezone.utc).replace(
        tzinfo=None
    )


def test_join_interval_overlap_planted(spark, tmp_path):
    d = datetime.datetime
    rows = [
        # cust 1: o1 [01-01, 01-02], o2 [01-02, 01-04] -> overlap 1 day
        (1, 1, d(2020, 1, 1), 500.0),
        (1, 2, d(2020, 1, 2), 1500.0),
        # o3 [01-10, 01-11] -> disjoint from both
        (1, 3, d(2020, 1, 10), 100.0),
        # cust 2: alone -> no pairs
        (2, 4, d(2020, 1, 1), 100.0),
    ]
    _write(spark, tmp_path, "orders", rows,
           "o_custkey long, o_orderkey long, o_orderdate timestamp, o_totalprice double")
    out = REG["join_interval_overlap"].fn(spark, str(tmp_path)).collect()
    assert [(r.custkey, r.key_a, r.key_b, r.overlap_days) for r in out] == [
        (1, 1, 2, 1)
    ]


def test_events_interval_union_planted(spark, tmp_path):
    rows = [
        # user 1: [1000,1060] + [1030,1060] merge; [2000,2120] separate
        (1, 1, _ts(1000), 1.0),
        (2, 1, _ts(1030), 0.5),
        (3, 1, _ts(2000), 2.0),
        # user 2: zero-length interval
        (4, 2, _ts(500), 0.0),
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id long, user_id long, ts timestamp, value double")
    out = {
        r.user_id: (r.covered_s, r.n_islands)
        for r in REG["events_interval_union"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {1: (60 + 120, 2), 2: (0, 1)}


def test_agg_mode_planted(spark, tmp_path):
    rows = [
        (1, 1, _ts(0), 0.0, "a"),
        (2, 1, _ts(1), 0.0, "a"),
        (3, 1, _ts(2), 0.0, "b"),
        (4, 1, _ts(3), 0.0, "b"),  # tie a/b -> lexicographically larger 'b'
        (5, 2, _ts(4), 0.0, "c"),
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id long, user_id long, ts timestamp, value double, event_type string")
    out = {
        r.user_id: (r.mode_type, r.mode_cnt)
        for r in REG["agg_mode"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {1: ("b", 2), 2: ("c", 1)}


def test_join_bloom_pruned_planted(spark, tmp_path):
    _write(spark, tmp_path, "part",
           [(1, "B1", 50), (2, "B2", 10)],
           "p_partkey long, p_brand string, p_size int")
    _write(spark, tmp_path, "lineitem",
           [(1, 10.0, 0.0), (1, 10.0, 0.0), (2, 99.0, 0.0), (3, 7.0, 0.0)],
           "l_partkey long, l_extendedprice double, l_discount double")
    out = REG["join_bloom_pruned"].fn(spark, str(tmp_path)).collect()
    # only B1 survives the p_size >= 46 dim filter; bloom must not
    # change the exact-join result
    assert [(r.p_brand, r.n_items, r.revenue_cents) for r in out] == [
        ("B1", 2, 2000)
    ]


def test_agg_salted_twophase_planted(spark, tmp_path):
    rows = [
        (1, 1, _ts(0), 1.25, "click"),
        (2, 1, _ts(1), 2.00, "click"),
        (3, 2, _ts(2), 3.50, "view"),
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id long, user_id long, ts timestamp, value double, event_type string")
    out = {
        r.event_type: (r.n, r.value_cents)
        for r in REG["agg_salted_twophase"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {"click": (2, 125 + 200), "view": (1, 350)}


def test_sample_reservoir_group_planted(spark, tmp_path):
    rows = [
        (i, f"text {i}", ("en" if i < 7 else "de"), "s", 10) for i in range(10)
    ]
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    out = REG["sample_reservoir_group"].fn(spark, str(tmp_path)).collect()
    got = {(r.lang, r.rk): r.doc_id for r in out}
    # replay the portable hash order in python
    def hv(doc_id):
        return int(hashlib.md5(f"{doc_id}|res42".encode()).hexdigest()[:15], 16)

    for lang, ids in (("en", range(0, 7)), ("de", range(7, 10))):
        expect = sorted(ids, key=lambda i: (hv(i), i))[:5]
        assert [got[(lang, k + 1)] for k in range(len(expect))] == expect
    assert len(out) == 5 + 3


def test_window_time_range_rolling_planted(spark, tmp_path):
    rows = [
        (1, 1, _ts(0), 1.0),
        (2, 1, _ts(1800), 1.0),
        (3, 1, _ts(3600), 1.0),   # frame [0, 3600] -> all three
        (4, 1, _ts(7201), 1.0),   # frame [3601, 7201] -> itself only
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id long, user_id long, ts timestamp, value double")
    out = {
        r.event_id: (r.n_1h, r.cents_1h)
        for r in REG["window_time_range_rolling"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {1: (1, 100), 2: (2, 200), 3: (3, 300), 4: (1, 100)}


def test_text_rake_keywords_planted(spark, tmp_path):
    rows = [
        (1, "the quick brown fox and quick brown fox", "en", "s", 10),
        (2, "quick brown fox is here", "en", "s", 10),
        (3, "a lazy dog", "en", "s", 10),
    ]
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    out = REG["text_rake_keywords"].fn(spark, str(tmp_path)).collect()
    got = [(r.rk, r.phrase, r.df) for r in sorted(out, key=lambda r: r.rk)]
    # "quick brown fox" appears in docs 1 and 2 (df=2, twice in doc 1
    # but df counts distinct docs); "here" is single-word (dropped);
    # "lazy dog" df=1
    assert got == [(1, "quick brown fox", 2), (2, "lazy dog", 1)]


def test_multimodal_audio_plan_planted(spark, tmp_path):
    rows = [(0, "t", "en", "s", 1), (3, "t", "en", "s", 1), (1, "t", "en", "s", 1)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    out = REG["multimodal_audio_plan"].fn(spark, str(tmp_path)).collect()
    # doc 0: 800 samples < 1024 -> no frames; doc 1: filtered (not %3);
    # doc 3: 2900 samples -> 4 frames at hop 512
    got = sorted((r.doc_id, r.frame_idx, r.start_sample, r.end_sample) for r in out)
    assert got == [(3, i, i * 512, i * 512 + 1024) for i in range(4)]


def test_text_bpe_pair_merges_planted(spark, tmp_path):
    rows = [(1, "abab ab", "en", "s", 1), (2, "ab", "en", "s", 1)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    out = [(r.pair, r.freq) for r in
           REG["text_bpe_pair_merges"].fn(spark, str(tmp_path)).collect()]
    # wc: abab x1 (pairs ab, ba, ab), ab x2 (pair ab) -> ab: 2*1 + 2 = 4
    assert out == [("ab", 4), ("ba", 1)]


def test_sample_kcenter_coreset_planted(spark, tmp_path):
    vecs = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 0),
        (2, [0.7071, 0.7071], 0),
        (3, [-1.0, 0.0], 0),
        (4, [0.9848, 0.1736], 0),  # near v0
    ]
    _write(spark, tmp_path, "embeddings", vecs,
           "vec_id long, embedding array<float>, label int")
    out = {r.center_rank: (r.center_id, r.n_assigned, r.max_dist_ppm)
           for r in REG["sample_kcenter_coreset"].fn(spark, str(tmp_path)).collect()}
    # greedy: c1=0 (min id), c2=3 (antipode, d=2), c3=1 (d=1), c4=2
    assert out[1][0] == 0 and out[2][0] == 3 and out[3][0] == 1 and out[4][0] == 2
    # v4 assigns to center 1 (cos 0.9848 -> d=0.0152)
    assert out[1][1] == 2 and out[1][2] == 15200
    assert out[2][1] == 1 and out[3][1] == 1 and out[4][1] == 1


def test_orders_rfm_segments_planted(spark, tmp_path):
    d = datetime.datetime
    # 5 customers, strictly increasing frequency/monetary and strictly
    # decreasing recency -> customer i lands in quintile i+1 for F and
    # M, and (since later last-day = smaller recency) quintile 5-i for R
    rows = []
    key = 0
    for cust in range(5):
        for k in range(cust + 1):
            rows.append((cust, key, d(2020, 1, 1 + cust), 1000.0 * (cust + 1)))
            key += 1
    _write(spark, tmp_path, "orders", rows,
           "o_custkey long, o_orderkey long, o_orderdate timestamp, o_totalprice double")
    out = {(r.r_score, r.f_score, r.m_score): (r.n_customers, r.segment_cents)
           for r in REG["orders_rfm_segments"].fn(spark, str(tmp_path)).collect()}
    # customer c: freq=c+1, monetary=(c+1)^2*100000 cents, recency=4-c days
    # freq quintiles of [1..5]: cuts at 1.8,2.6,3.4,4.2 -> scores 1..5
    # recency [4,3,2,1,0]: cuts 0.8,1.6,2.4,3.2 -> customer0 (rec 4) -> 5
    expect = {}
    for c in range(5):
        expect[(5 - c, c + 1, c + 1)] = (1, (c + 1) * (c + 1) * 100000)
    assert out == expect


def test_dedup_tfidf_cosine_planted(spark, tmp_path):
    # doc 1 and 2 share identical text (cosine 1.0); doc 3 disjoint
    rows = [
        (1, "alpha beta gamma delta", "en", "s", 10),
        (2, "alpha beta gamma delta", "en", "s", 10),
        (3, "omega sigma tau", "en", "s", 10),
    ]
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    out = [(r.id_a, r.id_b, r.cos_ppm)
           for r in REG["dedup_tfidf_cosine"].fn(spark, str(tmp_path)).collect()]
    assert out == [(1, 2, 1000000)]


def test_sample_balanced_classes_planted(spark, tmp_path):
    # labels: 0 -> 4 members, 1 -> 2 members => kmin = 2 per label
    vecs = [(i, [1.0, 0.0], 0) for i in range(4)] + [
        (10, [0.0, 1.0], 1), (11, [0.0, 1.0], 1)]
    _write(spark, tmp_path, "embeddings", vecs,
           "vec_id long, embedding array<float>, label int")
    out = REG["sample_balanced_classes"].fn(spark, str(tmp_path)).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r.label, []).append(r.vec_id)
    assert len(by_label[0]) == 2 and len(by_label[1]) == 2

    def hv(i):
        return int(hashlib.md5(f"{i}|bal42".encode()).hexdigest()[:15], 16)

    assert sorted(by_label[0]) == sorted(
        sorted(range(4), key=lambda i: (hv(i), i))[:2]
    )


def test_embed_label_separation_planted(spark, tmp_path):
    # label 0 members identical along x (cohesion 1.0); label 1 along y
    # -> global centroid ~ (0.5, 0.5)/|.|; each label centroid at 45
    # degrees from it -> centroid_vs_global equal for both labels
    vecs = [(0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0),
            (2, [0.0, 1.0], 1), (3, [0.0, 1.0], 1)]
    _write(spark, tmp_path, "embeddings", vecs,
           "vec_id long, embedding array<float>, label int")
    out = {r.label: (r.n_members, r.cohesion_ppm, r.centroid_vs_global_ppm)
           for r in REG["embed_label_separation"].fn(spark, str(tmp_path)).collect()}
    assert out[0][0] == 2 and out[1][0] == 2
    assert out[0][1] == 1000000 and out[1][1] == 1000000  # perfect cohesion
    # cos(45 deg) = 0.7071 on the 1e-4 grid -> 707100 ppm
    assert out[0][2] == out[1][2] == 707100


def test_orders_cohort_ltv_planted(spark, tmp_path):
    d = datetime.datetime
    rows = [
        # cohort 2020-01: cust 1 (orders Jan $10, Mar $20), cust 2 (Jan $40)
        (1, 1, d(2020, 1, 5), 10.0),
        (1, 2, d(2020, 3, 5), 20.0),
        (2, 3, d(2020, 1, 20), 40.0),
        # cohort 2020-02: cust 3 (Feb $100)
        (3, 4, d(2020, 2, 1), 100.0),
    ]
    _write(spark, tmp_path, "orders", rows,
           "o_custkey long, o_orderkey long, o_orderdate timestamp, o_totalprice double")
    out = {(r.cohort, r.month_offset): (r.cum_cents, r.cohort_size,
                                        r.ltv_cents_per_member)
           for r in REG["orders_cohort_ltv"].fn(spark, str(tmp_path)).collect()}
    assert out == {
        ("2020-01", 0): (5000, 2, 2500),
        ("2020-01", 2): (7000, 2, 3500),
        ("2020-02", 0): (10000, 1, 10000),
    }


def test_events_ab_bucketing_planted(spark, tmp_path):
    # users 1..40, 3 events each; purchases only for even users
    rows = []
    eid = 0
    for u in range(1, 41):
        for k in range(3):
            typ = "purchase" if (u % 2 == 0 and k == 0) else "click"
            rows.append((eid, u, _ts(eid), 1.0, typ))
            eid += 1
    _write(spark, tmp_path, "events", rows,
           "event_id long, user_id long, ts timestamp, value double, event_type string")
    out = {r.variant: r for r in
           REG["events_ab_bucketing"].fn(spark, str(tmp_path)).collect()}

    def variant(u):
        h = int(hashlib.md5(f"{u}|exp1".encode()).hexdigest()[:15], 16)
        return "control" if h % 1000 < 500 else "treatment"

    exp = {"control": 0, "treatment": 0}
    purchases = {"control": 0, "treatment": 0}
    for u in range(1, 41):
        exp[variant(u)] += 1
        if u % 2 == 0:
            purchases[variant(u)] += 1
    for v in ("control", "treatment"):
        assert out[v].n_users == exp[v]
        assert out[v].n_events == exp[v] * 3
        assert out[v].conversion_ppm == purchases[v] * 1000000 // (exp[v] * 3)
    # SRM identical on both rows, matches the closed form
    nc, nt = exp["control"], exp["treatment"]
    e = (nc + nt) / 2.0
    srm = math.floor(((nc - e) ** 2 / e + (nt - e) ** 2 / e) * 1e6 + 0.5)
    assert out["control"].srm_chi2_ppm == out["treatment"].srm_chi2_ppm == srm


def test_split_time_holdout_planted(spark, tmp_path):
    rows = [
        (1, 1, datetime.datetime(2024, 1, 10), 1.0),   # train
        (2, 1, datetime.datetime(2024, 1, 25), 1.0),   # test -> user 1 leaks
        (3, 2, datetime.datetime(2024, 1, 5), 1.0),    # train only
        (4, 3, datetime.datetime(2024, 1, 26), 1.0),   # test only
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id long, user_id long, ts timestamp, value double")
    out = {r.split: (r.n_events, r.n_users, r.leaked_users)
           for r in REG["split_time_holdout"].fn(spark, str(tmp_path)).collect()}
    assert out == {"train": (2, 2, 1), "test": (2, 2, 1)}


def test_sketch_kmv_distinct_planted(spark, tmp_path):
    # 30 distinct users per type -> below k=64, so the estimate falls
    # back to the EXACT distinct count (err 0); plus one type with
    # repeated users (distinct still counts once)
    rows = []
    eid = 0
    for u in range(30):
        rows.append((eid, u, _ts(eid), 1.0, "click")); eid += 1
    for u in range(10):
        for _ in range(3):
            rows.append((eid, u, _ts(eid), 1.0, "view")); eid += 1
    _write(spark, tmp_path, "events", rows,
           "event_id long, user_id long, ts timestamp, value double, event_type string")
    out = {r.event_type: (r.est_distinct, r.exact_distinct, r.err_ppm)
           for r in REG["sketch_kmv_distinct"].fn(spark, str(tmp_path)).collect()}
    assert out == {"click": (30, 30, 0), "view": (10, 10, 0)}


def test_graph_kcore_planted(spark, tmp_path):
    """2-core peeling on a hand graph: a triangle with a tail — the
    tail node (degree 1) and then nothing else peels; the triangle
    survives with degree 2 each.  Edges are planted via lineitem
    baskets (two co-purchases per pair to clear the support
    threshold)."""
    rows = []
    ok = 0
    # orders containing each pair twice -> support >= 2
    for pair in [(1, 2), (2, 3), (1, 3), (3, 4)]:
        for _ in range(2):
            rows.append((ok, pair[0]))
            rows.append((ok, pair[1]))
            ok += 1
    _write(spark, tmp_path, "lineitem", rows, "l_orderkey long, l_partkey long")
    out = {r.part: r.deg for r in
           REG["graph_kcore"].fn(spark, str(tmp_path)).collect()}
    # node 4 (tail, deg 1) peels in round 1; 1-2-3 triangle survives
    assert out == {1: 2, 2: 2, 3: 2}


def test_multimodal_tiles_plan_planted(spark, tmp_path):
    rows = [(4, "t", "en", "s", 1), (1, "t", "en", "s", 1)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    out = REG["multimodal_tiles_plan"].fn(spark, str(tmp_path)).collect()
    # doc 4: width (4%7)*40+64 = 224 -> 7 tiles; height (4%5)*40+64 =
    # 224 -> 7 tiles; doc 1 filtered (not %4)
    got = {(r.tile_x, r.tile_y, r.px, r.py) for r in out}
    assert len(out) == 49
    assert (0, 0, 0, 0) in got and (6, 6, 192, 192) in got


def _winnow_fps(text):
    """Python replay of the winnowing selection (5-gram md5 hashes,
    window-4 minima, distinct)."""
    ws = [w for w in __import__("re").split(r"[^a-z]+", text.lower()) if w]
    if len(ws) < 8:
        return set()
    hs = [
        int(hashlib.md5(" ".join(ws[i:i + 5]).encode()).hexdigest()[:15], 16)
        for i in range(len(ws) - 4)
    ]
    return {min(hs[i:i + 4]) for i in range(len(hs) - 3)}


def test_dedup_winnowing_planted(spark, tmp_path):
    # docs 1 and 2 share a 30-word passage -> many shared selected
    # fingerprints; doc 3 disjoint.  Expectations come from an exact
    # python replay of the selection, not a guess.
    passage = " ".join(
        "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
        * 3
    )
    texts = {
        1: passage + " extra one two three four",
        2: passage + " other tail five six seven",
        3: "completely different words everywhere around here today now ok",
    }
    rows = [(i, t, "en", "s", 10) for i, t in texts.items()]
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    out = {(r.id_a, r.id_b): r.shared_fps for r in
           REG["dedup_winnowing"].fn(spark, str(tmp_path)).collect()}
    fps = {i: _winnow_fps(t) for i, t in texts.items()}
    expect = {}
    for a in (1, 2, 3):
        for b in (1, 2, 3):
            if a < b:
                shared = len(fps[a] & fps[b])
                if shared >= 3:
                    expect[(a, b)] = shared
    assert (1, 2) in expect, "fixture must produce a sharing pair"
    assert out == expect
