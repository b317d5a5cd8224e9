"""Planted-semantics tests for the round-6 stats batch.

Hand-computed fixtures (same <name>.parquet convention as the sf dirs)
— the oracle gate can't catch a semantic flaw mirrored into the SQL
twin, these can.
"""

from __future__ import annotations

import datetime
import math

from rc_scanner_spark.queries import build_registry

REG = build_registry()

EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, event_type string"
)


from tests.conftest import write_fixture

_write = write_fixture


def _ts(s):
    return datetime.datetime.fromtimestamp(s, datetime.timezone.utc).replace(
        tzinfo=None
    )


def test_agg_ks_drift_planted(spark, tmp_path):
    rows = [
        (1, 1, _ts(0), 0.05, "click"),   # bin 0
        (2, 1, _ts(1), 0.15, "click"),   # bin 1
        (3, 1, _ts(2), 0.25, "click"),   # bin 2
        (4, 1, _ts(3), 0.25, "purchase"),  # bin 2
        (5, 1, _ts(4), 9.99, "view"),    # excluded
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = REG["agg_ks_drift"].fn(spark, str(tmp_path)).collect()[0]
    # click CDF ppm: 333333, 666666, 1000000; purchase: 0, 0, 1000000
    assert (r.ks_ppm, r.n_click, r.n_purchase) == (666666, 3, 1)


def test_agg_chi2_independence_planted(spark, tmp_path):
    # 2 types x 2 days-of-week, hand-checkable contingency
    rows = []
    eid = 0
    # Thursday 1970-01-01 (dow differs by engine tz-free epoch; use
    # fixed dates instead)
    d1 = datetime.datetime(2026, 8, 10)  # Monday
    d2 = datetime.datetime(2026, 8, 11)  # Tuesday
    for day, typ, n in [(d1, "click", 4), (d1, "view", 1),
                        (d2, "click", 1), (d2, "view", 4)]:
        for _ in range(n):
            rows.append((eid, 1, day, 1.0, typ))
            eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = REG["agg_chi2_independence"].fn(spark, str(tmp_path)).collect()[0]
    # replicate the per-cell integer-ization in python
    cells = {("click", 1): 4, ("view", 1): 1, ("click", 2): 1, ("view", 2): 4}
    rt = {"click": 5, "view": 5}
    ct = {1: 5, 2: 5}
    n = 10
    expect = sum(
        math.floor((o - rt[t] * ct[d] / n) ** 2 / (rt[t] * ct[d] / n) * 1e6 + 0.5)
        for (t, d), o in cells.items()
    )
    assert r.chi2_ppm == expect  # == 3.6 * 1e6
    assert r.n_cells == 4 and r.n_events == 10


def test_agg_ttest_welch_planted(spark, tmp_path):
    rows = [
        (1, 1, _ts(0), 1.0, "click"),
        (2, 1, _ts(1), 3.0, "click"),
        (3, 1, _ts(2), 1.0, "purchase"),
        (4, 1, _ts(3), 1.0, "purchase"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = REG["agg_ttest_welch"].fn(spark, str(tmp_path)).collect()[0]
    # cents: click [100, 300] mean 200 var 20000; purchase [100, 100]
    # mean 100 var 0 -> t = 100 / sqrt(20000/2) = 1.0
    assert (r.t_ppm, r.n_click, r.n_purchase) == (1000000, 2, 2)


def _oracle_df(tmp_path, sql):
    import duckdb

    con = duckdb.connect()
    # the fixture writer produces a directory of part files (Spark
    # layout), so glob inside it
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def test_agg_ttest_welch_degenerate_null_not_throw(spark, tmp_path):
    # ADVICE r6: a one-row group makes (n-1) = 0 and identical values
    # make the pooled variance exactly 0 — both must yield NULL t_ppm
    # on BOTH engines instead of an ANSI-mode throw.
    rows = [
        (1, 1, _ts(0), 1.0, "click"),
        (2, 1, _ts(1), 1.0, "click"),
        (3, 1, _ts(2), 1.0, "purchase"),  # nb = 1
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = REG["agg_ttest_welch"].fn(spark, str(tmp_path)).collect()[0]
    assert (r.t_ppm, r.n_click, r.n_purchase) == (None, 2, 1)
    o = _oracle_df(tmp_path, REG["agg_ttest_welch"].sql)
    assert len(o) == 1 and o["t_ppm"].isna().all()

    # zero pooled variance with both groups >= 2 rows
    rows = [
        (1, 1, _ts(0), 1.0, "click"),
        (2, 1, _ts(1), 1.0, "click"),
        (3, 1, _ts(2), 2.0, "purchase"),
        (4, 1, _ts(3), 2.0, "purchase"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = REG["agg_ttest_welch"].fn(spark, str(tmp_path)).collect()[0]
    assert (r.t_ppm, r.n_click, r.n_purchase) == (None, 2, 2)
    o = _oracle_df(tmp_path, REG["agg_ttest_welch"].sql)
    assert len(o) == 1 and o["t_ppm"].isna().all()


def test_agg_ks_drift_empty_input_zero_rows_both_engines(spark, tmp_path):
    # ADVICE r6: with zero click/purchase rows the twin previously
    # emitted one all-NULL row (global aggregate) while Spark's
    # groupBy emitted zero — both must emit zero.
    rows = [(1, 1, _ts(0), 1.0, "view")]  # no click/purchase rows
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    assert REG["agg_ks_drift"].fn(spark, str(tmp_path)).count() == 0
    assert len(_oracle_df(tmp_path, REG["agg_ks_drift"].sql)) == 0


def test_agg_ks_drift_one_sided_zero_rows_both_engines(spark, tmp_path):
    # review r7: purchase rows but ZERO click rows previously threw
    # DIVIDE_BY_ZERO on Spark (ANSI) while DuckDB returned a row —
    # a KS statistic needs both samples, so one-sided input is empty.
    rows = [
        (1, 1, _ts(0), 1.0, "purchase"),
        (2, 1, _ts(1), 2.0, "purchase"),
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    assert REG["agg_ks_drift"].fn(spark, str(tmp_path)).count() == 0
    assert len(_oracle_df(tmp_path, REG["agg_ks_drift"].sql)) == 0


def test_text_jsd_sources_planted(spark, tmp_path):
    rows = [
        (1, "aa bb", "en", "A", 5),
        (2, "aa cc", "en", "B", 5),
    ]
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string, n_chars long")
    out = {r.source: r.jsd_ppb
           for r in REG["text_jsd_sources"].fn(spark, str(tmp_path)).collect()}

    def jsd_ppb(present_words, ts, corpus, t):
        term_sum = 0
        q_sum = 0
        for w, csw in present_words.items():
            p = csw / ts
            q = corpus[w] / t
            term = 0.5 * p * math.log2(2 * p / (p + q)) + 0.5 * q * math.log2(
                2 * q / (p + q)
            )
            term_sum += math.floor(term * 1e9 + 0.5)
            q_sum += math.floor(q * 1e9 + 0.5)
        return term_sum + (10**9 - q_sum) // 2

    corpus = {"aa": 2, "bb": 1, "cc": 1}
    expect_a = jsd_ppb({"aa": 1, "bb": 1}, 2, corpus, 4)
    expect_b = jsd_ppb({"aa": 1, "cc": 1}, 2, corpus, 4)
    # +-2 ppb slack: Spark log2 (JVM) vs python log2 (libm) may differ
    # in the last ulp before integer-ization
    assert abs(out["A"] - expect_a) <= 2
    assert abs(out["B"] - expect_b) <= 2
    assert out["A"] == out["B"]  # symmetric fixture


def test_events_changepoint_cusum_planted(spark, tmp_path):
    d = datetime.datetime
    rows = []
    eid = 0
    for day, n in [(d(2026, 8, 1), 2), (d(2026, 8, 2), 2), (d(2026, 8, 3), 8)]:
        for _ in range(n):
            rows.append((eid, 1, day, 1.0, "click"))
            eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = REG["events_changepoint_cusum"].fn(spark, str(tmp_path)).collect()
    assert len(r) == 1
    # mean_ppm = 12e6 div 3 = 4e6; cusum: -2e6, -4e6, 0 -> peak 4e6 on day 2
    assert (r[0].event_type, r[0].peak_ppm, r[0].peak_day) == (
        "click", 4000000, "2026-08-02"
    )


def test_join_asof_tolerance_planted(spark, tmp_path):
    rows = [
        (1, 1, _ts(36000), 0.0, "purchase"),   # 10:00
        (2, 1, _ts(34200), 0.0, "click"),      # 09:30 in tolerance
        (3, 1, _ts(28800), 0.0, "click"),      # 08:00 too old
        (4, 2, _ts(36000), 0.0, "purchase"),
        (5, 2, _ts(28800), 0.0, "click"),      # only an out-of-window click
    ]
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {r.event_id: (r.click_event_id, r.gap_us)
           for r in REG["join_asof_tolerance"].fn(spark, str(tmp_path)).collect()}
    assert out == {1: (2, 1800 * 1000000), 4: (None, None)}


def test_events_autocorr_planted(spark, tmp_path):
    d = datetime.datetime
    # click daily counts over 5 days: 1, 2, 3, 4, 5 (perfectly linear
    # -> lag-k autocorrelation of the available pairs == 1.0 for all k)
    rows = []
    eid = 0
    for i, n in enumerate([1, 2, 3, 4, 5]):
        for _ in range(n):
            rows.append((eid, 1, d(2026, 8, 1 + i), 1.0, "click"))
            eid += 1
    _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    out = {r.lag_k: (r.r_ppm, r.n_pairs)
           for r in REG["events_autocorr"].fn(spark, str(tmp_path)).collect()}
    assert out == {1: (1000000, 4), 2: (1000000, 3), 3: (1000000, 2)}
