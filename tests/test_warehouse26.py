"""Planted-semantics tests for round-8 batch 34."""

from __future__ import annotations

import datetime

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture

ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp"
)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _d(y, m, day=1):
    return datetime.datetime(y, m, day)


def test_agg_hhi_concentration_planted(spark, tmp_path):
    # nation A: one customer owns everything -> HHI 1e9, top share 1e6
    # nation B: two equal customers -> HHI 2*(0.5^2)*1e9 = 5e8
    orders = [
        (1, 1, "O", 100.0, _d(2024, 1)),
        (2, 2, "O", 50.0, _d(2024, 1)),
        (3, 3, "O", 50.0, _d(2024, 1)),
    ]
    _write(spark, tmp_path, "orders", orders, ORD_SCHEMA)
    _write(
        spark, tmp_path, "customer",
        [(1, 10), (2, 20), (3, 20)],
        "c_custkey long, c_nationkey long",
    )
    _write(
        spark, tmp_path, "nation",
        [(10, "ALPHA"), (20, "BETA")],
        "n_nationkey long, n_name string",
    )
    out = {
        r.n_name: (r.n_customers, r.hhi_ppb, r.top_share_ppm)
        for r in REG["agg_hhi_concentration"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        "ALPHA": (1, 1_000_000_000, 1_000_000),
        "BETA": (2, 500_000_000, 500_000),
    }


def test_orders_seasonality_decomposition_planted(spark, tmp_path):
    # 24 months of revenue = 100 + 20*(month==12 bump): constant trend
    # 100 (cents 10000), December seasonal +20.  The 2x12 MA of a
    # series with one +20 bump per 12 months is 100 + 20/12 everywhere
    # the window is full; seasonal(dec) = mean(24*rev - t24).
    rows = []
    ok = 0
    for i in range(24):
        y, m = 2020 + i // 12, i % 12 + 1
        rev = 120.0 if m == 12 else 100.0
        ok += 1
        rows.append((ok, 1, "O", rev, _d(y, m)))
    _write(spark, tmp_path, "orders", rows, ORD_SCHEMA)
    out = {
        r.mon: (r.rev_cents, r.trend_milli, r.seasonal_milli, r.resid_milli)
        for r in REG["orders_seasonality_decomposition"].fn(spark, str(tmp_path)).collect()
    }
    assert len(out) == 24
    # months 1..6 and 19..24 (by position) have NULL trend
    assert out["2020-01"] == (10000, None, None, None)
    assert out["2021-12"] == (12000, None, None, None)
    # any full-window month: t24 = rev[-6]+2*sum(11 middle)+rev[+6].
    # For mon 2020-07 (rn 7): window rows rn 1..13 covers exactly one
    # December (rn 12): t24 = 10000 + 2*(10*10000 + 12000) + 10000 =
    # 244000 -> trend_milli = 244000*1000 DIV 24 = 10166666
    assert out["2020-07"][1] == 244000 * 1000 // 24
    # every full-window month has the same t24 (one December per 12)
    # -> detrended dec = 24*12000 - 244000 = 44000;
    # seasonal_milli(dec) = 44000*1000 DIV 24 = 1833333
    assert out["2020-12"][2] == 44000 * 1000 // 24
    # non-December seasonal: detrended = 24*10000 - 244000 = -4000 ->
    # -4000*1000 DIV 24 truncates toward zero: -166666
    assert out["2020-07"][2] == -(4000 * 1000 // 24)
    # residual identity: rev*10 - trend - seasonal
    for mon, (rev, t, s, resid) in out.items():
        if t is not None:
            assert resid == rev * 10 - t - s


def test_text_novelty_decay_planted(spark, tmp_path):
    # doc 0 introduces both shingles; doc 9 repeats doc 0 exactly and
    # introduces nothing.  doc_ids 0 and 9 with 10 buckets -> deciles
    # 0 and 9.
    rows = [
        (0, "alpha beta gamma delta", "en", "A", 22),   # shingles: 2
        (9, "alpha beta gamma delta", "en", "A", 22),
    ]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.decile: (r.n_docs, r.n_shingles, r.n_novel, r.novelty_ppm)
        for r in REG["text_novelty_decay"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {0: (1, 2, 2, 1_000_000), 9: (1, 2, 0, 0)}


def test_text_novelty_decay_empty_docs(spark, tmp_path):
    # a zero-shingle doc lands in a decile with 0/0 -> NULL ppm
    rows = [(0, "alpha beta gamma", "en", "A", 16), (9, "", "en", "A", 0)]
    _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = {
        r.decile: (r.n_docs, r.n_shingles, r.novelty_ppm)
        for r in REG["text_novelty_decay"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {0: (1, 1, 1_000_000), 9: (1, 0, None)}


def test_orders_backlog_aging_planted(spark, tmp_path):
    # snapshot = 2024-12-31 (max date, carried by a closed F order so
    # the open rows age against it); buckets split at 30/90/365
    snap = _d(2024, 12, 31)
    rows = [
        (1, 1, "F", 10.0, snap),                      # sets snapshot, excluded
        (2, 1, "O", 100.0, _d(2024, 12, 15)),          # age 16 -> 00-29d
        (3, 1, "O", 50.0, _d(2024, 10, 15)),           # age 77 -> 30-89d
        (4, 1, "P", 25.0, _d(2024, 3, 1)),             # age 305 -> 90-364d
        (5, 1, "P", 12.5, _d(2023, 1, 1)),             # age 730 -> 365d+
    ]
    _write(spark, tmp_path, "orders", rows, ORD_SCHEMA)
    out = {
        (r.o_orderstatus, r.age_bucket): (r.n_orders, r.value_cents)
        for r in REG["orders_backlog_aging"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        ("O", "00-29d"): (1, 10000),
        ("O", "30-89d"): (1, 5000),
        ("P", "90-364d"): (1, 2500),
        ("P", "365d+"): (1, 1250),
    }


def test_agg_hhi_zero_total_null_both_engines(spark, tmp_path):
    # review r8: a nation whose every order is zero-priced has tot=0;
    # the share guard must yield NULL HHI on BOTH engines (Spark would
    # throw DIVIDE_BY_ZERO, DuckDB would NaN-cast-error).
    import duckdb

    orders = [(1, 1, "O", 0.0, _d(2024, 1)), (2, 2, "O", 100.0, _d(2024, 1))]
    _write(spark, tmp_path, "orders", orders, ORD_SCHEMA)
    _write(
        spark, tmp_path, "customer", [(1, 10), (2, 20)],
        "c_custkey long, c_nationkey long",
    )
    _write(
        spark, tmp_path, "nation", [(10, "ZERO"), (20, "OK")],
        "n_nationkey long, n_name string",
    )
    out = {
        r.n_name: (r.n_customers, r.hhi_ppb, r.top_share_ppm)
        for r in REG["agg_hhi_concentration"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        "ZERO": (1, None, None),
        "OK": (1, 1_000_000_000, 1_000_000),
    }
    con = duckdb.connect()
    for t in ("orders", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    o = con.execute(REG["agg_hhi_concentration"].sql).df()
    con.close()
    import pandas as pd

    by = {r.n_name: r for r in o.itertuples()}
    assert pd.isna(by["ZERO"].hhi_ppb) and int(by["OK"].hhi_ppb) == 1_000_000_000


# --------------------------------------------------------------------
# batch 36: tier migration + single-source risk
# --------------------------------------------------------------------


def test_orders_tier_migration_planted(spark, tmp_path):
    # 2023: cust 1 spends 80 (cum 80% -> A), cust 2 spends 15 (95% ->
    # B), cust 3 spends 5 (C).  2024: cust 1 drops to C-range, cust 2
    # becomes the A, cust 3 absent.
    rows = [
        (1, 1, "O", 80.0, _d(2023, 6)),
        (2, 2, "O", 15.0, _d(2023, 6)),
        (3, 3, "O", 5.0, _d(2023, 6)),
        (4, 2, "O", 80.0, _d(2024, 6)),
        (5, 1, "O", 20.0, _d(2024, 6)),
    ]
    _write(spark, tmp_path, "orders", rows, ORD_SCHEMA)
    out = {
        (r.yr_from, r.tier_from, r.tier_to): r.n_customers
        for r in REG["orders_tier_migration"].fn(spark, str(tmp_path)).collect()
    }
    # 2024 classes: cust2 cum 80/100 -> A; cust1 cum 100/100 -> C
    assert out == {
        (2023, "A", "C"): 1,     # cust 1: A -> C
        (2023, "B", "A"): 1,     # cust 2: B -> A
        (2023, "C", "GONE"): 1,  # cust 3 absent in 2024
        (2024, "A", "GONE"): 1,  # no 2025 data
        (2024, "C", "GONE"): 1,
    }


def test_part_single_source_risk_planted(spark, tmp_path):
    import datetime as _dt

    y = _dt.datetime(2024, 1, 1)
    # part 1: one supplier, revenue 100; part 2: six suppliers,
    # revenue 300 -> bands 1 and 6; shares 250000 / 750000 ppm
    rows = [(1, 1, 101, 1.0, 100.0, 0.0, y)]
    rows += [(10 + i, 2, 200 + i, 1.0, 50.0, 0.0, y) for i in range(6)]
    _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    out = {
        r.band_lo: (r.n_parts, r.rev_cents, r.rev_share_ppm)
        for r in REG["part_single_source_risk"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {1: (1, 10000, 250000), 6: (1, 30000, 750000)}
