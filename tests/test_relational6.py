"""Planted-semantics tests for round-8 batches 37-38 (TPC-H
Q2/Q11/Q20/Q21 shapes + Mann-Kendall)."""

from __future__ import annotations

import datetime
import math

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture

LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
    "l_extendedprice double, l_shipdate timestamp"
)
SUP_SCHEMA = "s_suppkey long, s_name string, s_nationkey long, s_acctbal double"
NAT_SCHEMA = "n_nationkey long, n_name string, n_regionkey long"
REG_SCHEMA = "r_regionkey long, r_name string"
PART_SCHEMA = "p_partkey long, p_name string, p_brand string, p_type string"
EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _d(y, m, day):
    return datetime.datetime(y, m, day)


def _dims(spark, tmp_path):
    _write(
        spark, tmp_path, "region", [(0, "EUROPE"), (1, "ASIA")], REG_SCHEMA
    )
    _write(
        spark, tmp_path, "nation",
        [(10, "NATION_A", 0), (11, "NATION_B", 1)],
        NAT_SCHEMA,
    )


def test_tpch_q2ish_planted(spark, tmp_path):
    # part 1: EU2 wins on unit cost (400000 < 500000 milli-cents);
    # the ASIA supplier's cheaper line is excluded by region.
    # part 3: EU1 and EU2 TIE at 500000 -> both rows kept (Q2 keeps
    # ties).  part 2 is non-ECONOMY -> filtered.
    _dims(spark, tmp_path)
    _write(
        spark, tmp_path, "supplier",
        [
            (100, "S_EU1", 10, 500.0),
            (101, "S_EU2", 10, 100.0),
            (102, "S_AS", 11, 900.0),
        ],
        SUP_SCHEMA,
    )
    _write(
        spark, tmp_path, "part",
        [
            (1, "red widget", "Brand#1", "ECONOMY"),
            (2, "blue bolt", "Brand#2", "SMALL"),
            (3, "hot gear", "Brand#3", "ECONOMY"),
        ],
        PART_SCHEMA,
    )
    d = _d(2000, 1, 1)
    li = [
        (1, 1, 100, 2.0, 10.0, d),   # cost 1000c*1000 // 2 = 500000
        (2, 1, 101, 1.0, 4.0, d),    # cost 400000 -> min for part 1
        (3, 1, 102, 1.0, 0.01, d),   # non-EUROPE: excluded
        (4, 2, 100, 1.0, 1.0, d),    # SMALL part: filtered
        (5, 3, 100, 1.0, 5.0, d),    # cost 500000 }
        (6, 3, 101, 2.0, 10.0, d),   # cost 500000 } tie -> both kept
    ]
    _write(spark, tmp_path, "lineitem", li, LI_SCHEMA)
    rows = [
        (r.p_partkey, r.p_brand, r.s_name, r.n_name, r.acctbal_cents,
         r.cost_milli)
        for r in REG["tpch_q2ish"].fn(spark, str(tmp_path)).collect()
    ]
    # order: acctbal desc (EU1 50000 first), then partkey, then name
    assert rows == [
        (3, "Brand#3", "S_EU1", "NATION_A", 50000, 500000),
        (1, "Brand#1", "S_EU2", "NATION_A", 10000, 400000),
        (3, "Brand#3", "S_EU2", "NATION_A", 10000, 500000),
    ]


def test_tpch_q11ish_planted(spark, tmp_path):
    # NATION_7 supplier ships 4 parts: one worth 100.00, three worth
    # 10.00 -> only the big part clears val * np > 2 * tot
    # (40000 > 26000); the other nation's lines never count.
    _write(
        spark, tmp_path, "nation",
        [(7, "NATION_7", 0), (8, "NATION_8", 0)],
        NAT_SCHEMA,
    )
    _write(
        spark, tmp_path, "supplier",
        [(1, "S7", 7, 0.0), (2, "S8", 8, 0.0)],
        SUP_SCHEMA,
    )
    d = _d(2000, 1, 1)
    li = [
        (1, 1, 1, 1.0, 100.0, d),
        (2, 2, 1, 1.0, 10.0, d),
        (3, 3, 1, 1.0, 10.0, d),
        (4, 4, 1, 1.0, 10.0, d),
        (5, 1, 2, 1.0, 999.0, d),  # other nation: excluded
    ]
    _write(spark, tmp_path, "lineitem", li, LI_SCHEMA)
    out = [
        (r.p_partkey, r.value_cents)
        for r in REG["tpch_q11ish"].fn(spark, str(tmp_path)).collect()
    ]
    assert out == [(1, 10000)]


def test_tpch_q11ish_uniform_empty_both_engines(spark, tmp_path):
    # perfectly uniform values: every part sits AT the average, none
    # above 2x -> empty on BOTH engines (exact-integer threshold; a
    # float share could drift a boundary row in one engine only).
    import duckdb

    _write(spark, tmp_path, "nation", [(7, "NATION_7", 0)], NAT_SCHEMA)
    _write(spark, tmp_path, "supplier", [(1, "S7", 7, 0.0)], SUP_SCHEMA)
    d = _d(2000, 1, 1)
    li = [(1, 1, 1, 1.0, 10.0, d), (2, 2, 1, 1.0, 10.0, d)]
    _write(spark, tmp_path, "lineitem", li, LI_SCHEMA)
    assert REG["tpch_q11ish"].fn(spark, str(tmp_path)).count() == 0
    con = duckdb.connect()
    for t in ("nation", "supplier", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    assert len(con.execute(REG["tpch_q11ish"].sql).fetchall()) == 0
    con.close()


def test_tpch_q20ish_planted(spark, tmp_path):
    # supplier 100: lifetime 50 units (exactly at the floor), 34
    # recent -> 102 > 100 qualifies.  101: 49 lifetime, all recent ->
    # under the floor.  102: exactly 2/3 recent (40/60) -> strict >
    # fails.  103 ships only a non-'red ' part.
    _write(
        spark, tmp_path, "supplier",
        [(100, "S1", 0, 0.0), (101, "S2", 0, 0.0), (102, "S3", 0, 0.0),
         (103, "S4", 0, 0.0)],
        SUP_SCHEMA,
    )
    _write(
        spark, tmp_path, "part",
        [(1, "red widget", "Brand#1", "ECONOMY"),
         (2, "blue bolt", "Brand#2", "ECONOMY")],
        PART_SCHEMA,
    )
    old, new = _d(2000, 6, 1), _d(2001, 6, 1)
    li = [
        (1, 1, 100, 16.0, 1.0, old), (2, 1, 100, 34.0, 1.0, new),
        (3, 1, 101, 49.0, 1.0, new),
        (4, 1, 102, 20.0, 1.0, old), (5, 1, 102, 40.0, 1.0, new),
        (6, 2, 103, 500.0, 1.0, new),
    ]
    _write(spark, tmp_path, "lineitem", li, LI_SCHEMA)
    out = [
        (r.s_suppkey, r.s_name, r.n_hot_parts)
        for r in REG["tpch_q20ish"].fn(spark, str(tmp_path)).collect()
    ]
    assert out == [(100, "S1", 1)]


def test_tpch_q21ish_planted(spark, tmp_path):
    # order 1: A slow, B on time -> counts for A.  order 2: both slow
    # -> nobody counts.  order 3: single-supplier -> excluded.
    # order 4: A ships at EXACTLY +90 days -> not slow (strict >).
    _write(spark, tmp_path, "region", [(1, "ASIA")], REG_SCHEMA)
    _write(spark, tmp_path, "nation", [(20, "NATION_X", 1)], NAT_SCHEMA)
    _write(
        spark, tmp_path, "supplier",
        [(1, "SA", 20, 0.0), (2, "SB", 20, 0.0)],
        SUP_SCHEMA,
    )
    _write(
        spark, tmp_path, "orders",
        [(1, _d(2024, 1, 1)), (2, _d(2024, 1, 1)), (3, _d(2024, 1, 1)),
         (4, _d(2024, 1, 1))],
        "o_orderkey long, o_orderdate timestamp",
    )
    li = [
        (1, 1, 1, 1.0, 1.0, _d(2024, 5, 1)),    # A slow
        (1, 1, 2, 1.0, 1.0, _d(2024, 1, 15)),   # B on time
        (2, 1, 1, 1.0, 1.0, _d(2024, 5, 1)),    # A slow
        (2, 1, 2, 1.0, 1.0, _d(2024, 5, 1)),    # B slow too
        (3, 1, 1, 1.0, 1.0, _d(2024, 5, 1)),    # single supplier
        (4, 1, 1, 1.0, 1.0, _d(2024, 3, 31)),   # exactly +90d: on time
        (4, 1, 2, 1.0, 1.0, _d(2024, 1, 2)),
    ]
    _write(spark, tmp_path, "lineitem", li, LI_SCHEMA)
    out = [
        (r.s_suppkey, r.s_name, r.n_name, r.numwait)
        for r in REG["tpch_q21ish"].fn(spark, str(tmp_path)).collect()
    ]
    assert out == [(1, "SA", "NATION_X", 1)]


# --------------------------------------------------------------------
# batch 38: Mann-Kendall
# --------------------------------------------------------------------


def _events_for_daily_counts(counts):
    """One 'click' event stream with counts[i] events on day i."""
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for k in range(c):
            eid += 1
            rows.append(
                (eid, datetime.datetime(2024, 1, 1 + i, 0, 0, k), 1,
                 "click", 0.0, "{}")
            )
    return rows


def test_stats_mann_kendall_increasing(spark, tmp_path):
    # counts 1,2,3: S = +3 (all pairs rise), no ties ->
    # var = 3*2*11/18, z = (3-1)/sqrt(var), tau = 3/3 = 1.
    _write(
        spark, tmp_path, "events", _events_for_daily_counts([1, 2, 3]),
        EV_SCHEMA,
    )
    r = REG["stats_mann_kendall"].fn(spark, str(tmp_path)).collect()
    assert len(r) == 1
    row = r[0]
    var = (3 * 2 * 11 - 0) / 18.0
    assert (row.event_type, row.n_days, row.s_stat) == ("click", 3, 3)
    assert row.z_milli == math.floor(2.0 / math.sqrt(var) * 1000)
    assert row.tau_milli == 1000


def test_stats_mann_kendall_with_ties(spark, tmp_path):
    # counts 1,1,2: S = 2; one tie pair in y (t=2) ->
    # var = (66 - 18)/18; tau = 2/sqrt(3 * (3-1)).
    _write(
        spark, tmp_path, "events", _events_for_daily_counts([1, 1, 2]),
        EV_SCHEMA,
    )
    row = REG["stats_mann_kendall"].fn(spark, str(tmp_path)).collect()[0]
    var = (3 * 2 * 11 - 2 * 1 * 9) / 18.0
    assert (row.n_days, row.s_stat) == (3, 2)
    assert row.z_milli == math.floor((2 - 1) / math.sqrt(var) * 1000)
    assert row.tau_milli == math.floor(2 / math.sqrt(3.0 * 2.0) * 1000)


def test_stats_mann_kendall_all_tied_null_both_engines(spark, tmp_path):
    # constant series: variance 0 and tau denominator 0 -> NULL on
    # BOTH engines (Spark ANSI double/0.0 throws, DuckDB inf-casts —
    # the exact divergence class the CASE guards exist for).
    import duckdb
    import pandas as pd

    _write(
        spark, tmp_path, "events", _events_for_daily_counts([1, 1]),
        EV_SCHEMA,
    )
    row = REG["stats_mann_kendall"].fn(spark, str(tmp_path)).collect()[0]
    assert (row.n_days, row.s_stat, row.z_milli, row.tau_milli) == (
        2, 0, None, None,
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    o = con.execute(REG["stats_mann_kendall"].sql).df()
    con.close()
    assert len(o) == 1
    assert int(o.s_stat[0]) == 0
    assert pd.isna(o.z_milli[0]) and pd.isna(o.tau_milli[0])


def test_stats_mann_kendall_python_replay(spark, tmp_path):
    # house style for statistical ops (pagerank replay precedent):
    # a seeded random series replayed against a plain-Python
    # Mann-Kendall implementation, exercising mixed ties/runs beyond
    # the hand-planted cases.
    import random

    rng = random.Random(8)
    counts = [rng.randint(0, 4) for _ in range(14)]
    while len(set(counts)) <= 1:  # keep the non-degenerate branch
        counts = [rng.randint(0, 4) for _ in range(14)]
    _write(
        spark, tmp_path, "events", _events_for_daily_counts(counts),
        EV_SCHEMA,
    )
    row = REG["stats_mann_kendall"].fn(spark, str(tmp_path)).collect()[0]

    n = len(counts)
    s = sum(
        (counts[j] > counts[i]) - (counts[j] < counts[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie_sizes = [counts.count(v) for v in set(counts)]
    tsum = sum(t * (t - 1) * (2 * t + 5) for t in tie_sizes)
    tpair = sum(t * (t - 1) for t in tie_sizes)
    var = (n * (n - 1) * (2 * n + 5) - tsum) / 18.0
    z = 0.0 if s == 0 else (s - 1 if s > 0 else s + 1) / math.sqrt(var)
    d0 = n * (n - 1) // 2
    dy = d0 - tpair // 2
    tau = s / math.sqrt(d0 * dy)
    assert (row.n_days, row.s_stat) == (n, s)
    assert row.z_milli == math.floor(z * 1000)
    assert row.tau_milli == math.floor(tau * 1000)
