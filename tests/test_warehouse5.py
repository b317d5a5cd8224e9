"""Planted-semantics tests for the round-6 warehouse5 batch
(association rules, Gini, Mann-Whitney, segmented TTR, shard
manifest).

Hand-computed tiny fixtures — the oracle gate can't catch a semantic
flaw mirrored into the SQL twin, these can.
"""

from __future__ import annotations

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture


def test_basket_association_rules_planted(spark, tmp_path):
    # baskets: o1..o3 = {1,2}; o4 = {1,3}; o5 = {2}
    rows = [
        (1, 1), (1, 2),
        (2, 1), (2, 2),
        (3, 1), (3, 2),
        (4, 1), (4, 3),
        (5, 2),
    ]
    _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long",
    )
    out = REG["basket_association_rules"].fn(spark, str(tmp_path)).collect()
    # only (1->2) and (2->1) reach support 3; na=nb=4, tot=5:
    # confidence = 3/4 -> 750000 ppm; lift = 3*5/16 -> 937500 ppm
    assert [
        (r.pa, r.pb, r.support, r.confidence_ppm, r.lift_ppm) for r in out
    ] == [
        (1, 2, 3, 750000, 937500),
        (2, 1, 3, 750000, 937500),
    ]


def test_agg_gini_planted(spark, tmp_path):
    rows = [
        # segment A: 1.00/2.00/3.00 -> G = 400/1800 = .2222 -> 222222
        (1, "A", 1.00),
        (2, "A", 2.00),
        (3, "A", 3.00),
        # segment B: perfectly equal -> G = 0
        (4, "B", 2.00),
        (5, "B", 2.00),
        # segment C: sum 0 -> NULL guard (ANSI-safe)
        (6, "C", -1.00),
        (7, "C", 1.00),
    ]
    _write(
        spark, tmp_path, "customer", rows,
        "c_custkey long, c_mktsegment string, c_acctbal double",
    )
    out = {
        r.c_mktsegment: (r.n_customers, r.sum_cents, r.gini_ppm)
        for r in REG["agg_gini"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        "A": (3, 600, 222222),
        "B": (2, 400, 0),
        "C": (2, 0, None),
    }


def test_stats_mann_whitney_planted(spark, tmp_path):
    import datetime

    d = datetime.datetime(2020, 1, 1)
    rows = [
        # click (A): 1.0, 3.0 ; view (B): 2.0, 3.0, 4.0
        (1, d, "click", 1.0),
        (2, d, "click", 3.0),
        (3, d, "view", 2.0),
        (4, d, "view", 3.0),
        (5, d, "view", 4.0),
        # other types must be ignored
        (6, d, "error", 99.0),
    ]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, event_type string, value double",
    )
    [r] = REG["stats_mann_whitney"].fn(spark, str(tmp_path)).collect()
    # ranks: 1->1, 2->2, {3,3}->3.5, 4->5 ; R_A = 4.5 -> U_A = 1.5
    assert (r.n_a, r.n_b, r.u2_a, r.tie_term) == (2, 3, 3, 6)
    # z = (2U - n1 n2) / (2 sqrt(n1 n2/12 * (N+1 - tie/(N(N-1)))))
    #   = -3 / (2 sqrt(2.85)) = -0.88852... -> floor(-888.52) = -889
    assert r.z_milli == -889


def test_stats_mann_whitney_all_tied_guard(spark, tmp_path):
    import datetime

    d = datetime.datetime(2020, 1, 1)
    rows = [
        (1, d, "click", 5.0),
        (2, d, "view", 5.0),
    ]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, event_type string, value double",
    )
    [r] = REG["stats_mann_whitney"].fn(spark, str(tmp_path)).collect()
    # single tie block: sigma = 0 -> z NULL, never a divide-by-zero
    assert r.z_milli is None and (r.n_a, r.n_b) == (1, 1)


def test_text_ttr_segments_planted(spark, tmp_path):
    # 50 distinct two-letter tokens (segment 0, TTR 1.0) then "x x x"
    # (segment 1, TTR 1/3); mean ppm = (1000000 + 333333) // 2
    words = [
        "w" + chr(97 + i // 26) + chr(97 + i % 26) for i in range(50)
    ]
    text_a = " ".join(words + ["x", "x", "x"])
    rows = [
        (1, text_a, "s"),
        (2, "a b a", "s"),          # one segment: 2 types / 3 tokens
        (3, "12345 !!!", "s"),      # no [a-z] tokens -> no output row
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: (r.n_segments, r.mean_ttr_ppm)
        for r in REG["text_ttr_segments"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {1: (2, 666666), 2: (1, 666666)}


def test_multimodal_shard_manifest_planted(spark, tmp_path):
    rows = [
        # source s: greedy 2000-byte shards in doc_id order
        (1, "s", 1500),
        (2, "s", 600),   # cum_prev 1500 -> still shard 0 (2100 bytes)
        (3, "s", 1000),  # cum_prev 2100 -> shard 1
        (4, "s", 100),   # cum_prev 3100 -> shard 1
        # a second source shards independently
        (9, "t", 50),
    ]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, source string, n_chars long",
    )
    out = {
        (r.source, r.shard): (r.n_docs, r.bytes, r.first_doc_id, r.last_doc_id)
        for r in REG["multimodal_shard_manifest"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {
        ("s", 0): (2, 2100, 1, 2),
        ("s", 1): (2, 1100, 3, 4),
        ("t", 0): (1, 50, 9, 9),
    }


def test_stats_mann_whitney_single_row_guard(spark, tmp_path):
    import datetime

    d = datetime.datetime(2020, 1, 1)
    rows = [(1, d, "click", 5.0)]  # n = 1: tie fraction would be 0/0
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, event_type string, value double",
    )
    [r] = REG["stats_mann_whitney"].fn(spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b, r.z_milli) == (1, 0, None)


def test_basket_association_rules_capped_universe(spark, tmp_path):
    # pa's marginal must count CAPPED baskets only: pa appears in one
    # capped basket (with pb) and one over-cap basket (21 items) —
    # confidence must be 2/2 = 100%, not 2/3.
    rows = []
    for o in (1, 2):  # two capped baskets {1, 2}
        rows += [(o, 1), (o, 2)]
    rows += [(3, 1), (3, 2)]  # third capped basket for support 3
    rows += [(9, 1)] + [(9, 100 + i) for i in range(21)]  # over-cap
    _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long",
    )
    out = {
        (r.pa, r.pb): r.confidence_ppm
        for r in REG["basket_association_rules"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out[(1, 2)] == 1_000_000  # 3 of 3 capped pa-baskets
    assert out[(2, 1)] == 1_000_000


def test_stats_mann_whitney_null_values_excluded_both_engines(
    spark, tmp_path
):
    # NULL values must not perturb the ranks (review r10, the
    # stats_kruskal_wallis hazard: the NULL tie-group buckets to the
    # top range bucket on both engines but window-sorts FIRST in
    # Spark and LAST in DuckDB).  With the explicit exclusion the
    # result equals the planted no-NULL case on both engines.
    import datetime

    import duckdb

    d = datetime.datetime(2020, 1, 1)
    rows = [
        (1, d, "click", 1.0),
        (2, d, "click", 3.0),
        (3, d, "view", 2.0),
        (4, d, "view", 3.0),
        (5, d, "view", 4.0),
        (6, d, "click", None),
        (7, d, "view", None),
    ]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, event_type string, value double",
    )
    [r] = REG["stats_mann_whitney"].fn(spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b, r.u2_a, r.tie_term) == (2, 3, 3, 6)
    assert r.z_milli == -889
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    o = con.execute(REG["stats_mann_whitney"].sql).df()
    con.close()
    assert (int(o.n_a[0]), int(o.n_b[0]), int(o.u2_a[0]), int(o.z_milli[0])) \
        == (2, 3, 3, -889)
