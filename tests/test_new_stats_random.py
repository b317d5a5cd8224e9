"""Randomized replay of the round-10 statistics (ANOVA, runs test,
Friedman, Cramér–von Mises) against independent plain-Python textbook
implementations, plus exact Spark-vs-DuckDB parity per draw.

Same rationale as test_rank_machinery_random.py: the oracle gate
can't catch a flaw mirrored into both twins; seeded random inputs
checked against an independent implementation can.  Tolerances are
derived from each operator's documented integer quantization (DIV
floors for ANOVA, ppm CDF floors for CvM, final half-up rounding
everywhere); the engine-parity assertion is always exact.
"""

from __future__ import annotations

import pytest
pytestmark = pytest.mark.slow  # certification lane (pytest.ini)


import datetime
import math
import random
from collections import Counter, defaultdict
from itertools import groupby

import duckdb

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture

EV_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, event_type string"
)


def _duck(tmp_path, table, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{tmp_path}/{table}.parquet/*.parquet')"
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


def _avg_positions(values):
    pos, i = {}, 0
    for v, grp in groupby(sorted(values)):
        c = len(list(grp))
        pos[v] = i + (c + 1) / 2
        i += c
    return pos


def test_anova_oneway_random_engine_parity_and_textbook(spark, tmp_path):
    rng = random.Random(431)
    for _ in range(3):
        rows = [
            (i + 1, rng.choice(["A", "N", "R"]),
             float(rng.randint(1, 50)))
            for i in range(40)
        ]
        _write(
            spark, tmp_path, "lineitem", rows,
            "l_orderkey long, l_returnflag string, l_quantity double",
        )
        [r] = REG["stats_anova_oneway"].fn(spark, str(tmp_path)).collect()
        [o] = _duck(tmp_path, "lineitem", REG["stats_anova_oneway"].sql)
        assert (r.n_groups, r.n_rows, r.f_milli, r.eta_sq_ppm) == tuple(
            int(x) for x in o
        )
        # textbook F on quantity cents
        vals = defaultdict(list)
        for _, g, q in rows:
            vals[g].append(round(q * 100))
        k = len(vals)
        n = sum(len(v) for v in vals.values())
        grand = sum(sum(v) for v in vals.values()) / n
        ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in vals.values())
        ssw = sum(
            sum((x - sum(v) / len(v)) ** 2 for x in v) for v in vals.values()
        )
        # the integer readout truncates each s^2 DIV n quotient by <1:
        # SSB and SSW each drift by at most k+1 absolute cents^2
        f_lo = ((ssb - (k + 1)) / (k - 1)) / ((ssw + k + 1) / (n - k))
        f_hi = ((ssb + (k + 1)) / (k - 1)) / (max(ssw - (k + 1), 1) / (n - k))
        assert f_lo * 1000 - 1 <= r.f_milli <= f_hi * 1000 + 1
        eta = ssb / (ssb + ssw)
        assert abs(r.eta_sq_ppm - eta * 1e6) <= (2 * k + 2) / (ssb + ssw) * 1e6 + 1


def test_runs_test_random_engine_parity_and_textbook(spark, tmp_path):
    rng = random.Random(432)
    for _ in range(3):
        rows = [
            (i + 1, datetime.date(2024, 1 + i // 28, 1 + i % 28),
             float(rng.randint(100, 999)))
            for i in range(40)
        ]
        _write(
            spark, tmp_path, "orders", rows,
            "o_orderkey long, o_orderdate date, o_totalprice double",
        )
        [r] = REG["stats_runs_test"].fn(spark, str(tmp_path)).collect()
        [o] = _duck(tmp_path, "orders", REG["stats_runs_test"].sql)
        assert (r.n_up, r.n_down, r.n_runs, r.z_milli) == tuple(
            int(x) if x is not None else None for x in o
        )
        # textbook: direction sequence of day-over-day revenue change
        daily = defaultdict(int)
        for _, d, p in rows:
            daily[d] += round(p * 100)
        revs = [daily[d] for d in sorted(daily)]
        dirs = [
            1 if b > a else 0
            for a, b in zip(revs, revs[1:])
            if b != a
        ]
        n1, n2 = sum(dirs), len(dirs) - sum(dirs)
        runs = sum(
            1 for i, d in enumerate(dirs) if i == 0 or d != dirs[i - 1]
        )
        assert (r.n_up, r.n_down, r.n_runs) == (n1, n2, runs)
        nn = n1 + n2
        sigma2 = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) / (nn * nn * (nn - 1.0))
            if nn > 1 else 0.0
        )
        if sigma2 > 0:
            z = (runs - (2.0 * n1 * n2 / nn + 1.0)) / math.sqrt(sigma2)
            assert abs(r.z_milli - z * 1000.0) <= 1
        else:
            assert r.z_milli is None


def test_friedman_random_engine_parity_and_textbook(spark, tmp_path):
    rng = random.Random(433)
    for _ in range(3):
        # 3 types over 8 days, sparse counts -> zero-filled blocks
        rows, eid = [], 0
        for day in range(1, 9):
            for t in ("click", "view", "purchase"):
                for _ in range(rng.randint(0, 3)):
                    eid += 1
                    rows.append(
                        (eid, 1, datetime.datetime(2024, 1, day), 1.0, t)
                    )
        if not rows:
            continue
        _write(spark, tmp_path, "events", rows, EV_SCHEMA)
        [r] = REG["stats_friedman"].fn(spark, str(tmp_path)).collect()
        [o] = _duck(tmp_path, "events", REG["stats_friedman"].sql)
        assert (
            r.n_days, r.n_types, r.tie_term, r.q_milli, r.q_corr_milli
        ) == tuple(int(x) if x is not None else None for x in o)
        # textbook Friedman over the zero-filled spine: observed day
        # range x observed types, within-day average ranks
        days = sorted({ts.date() for (_, _, ts, _, _) in rows})
        span = [
            days[0] + datetime.timedelta(d)
            for d in range((days[-1] - days[0]).days + 1)
        ]
        types = sorted({t for (*_, t) in rows})
        cnt = Counter(((ts.date(), t) for (_, _, ts, _, t) in rows))
        k, n = len(types), len(span)
        rsum = defaultdict(float)
        tie = 0
        for day in span:
            block = [cnt.get((day, t), 0) for t in types]
            pos = _avg_positions(block)
            for t, c in zip(types, block):
                rsum[t] += pos[c]
            tie += sum(c**3 - c for c in Counter(block).values())
        assert r.tie_term == tie
        q = (
            12.0 / (n * k * (k + 1)) * sum(v**2 for v in rsum.values())
            - 3.0 * n * (k + 1)
        )
        assert abs(r.q_milli - q * 1000.0) <= 2
        corr = 1.0 - tie / (n * k * (k * k - 1))
        if corr > 0:
            assert abs(r.q_corr_milli - q / corr * 1000.0) <= 2 / corr + 1
        else:
            assert r.q_corr_milli is None


def test_cvm_drift_random_engine_parity_and_textbook(spark, tmp_path):
    rng = random.Random(434)
    for _ in range(3):
        rows = [
            (i + 1, 1, datetime.datetime(2024, 1, 1 + i % 28),
             rng.randint(0, 30) / 10.0,
             rng.choice(["click", "purchase", "view"]))
            for i in range(60)
        ]
        _write(spark, tmp_path, "events", rows, EV_SCHEMA)
        res = REG["stats_cvm_drift"].fn(spark, str(tmp_path)).collect()
        ora = _duck(tmp_path, "events", REG["stats_cvm_drift"].sql)
        assert [
            (r.cvm_t_milli, r.n_click, r.n_purchase) for r in res
        ] == [tuple(int(x) for x in row) for row in ora]
        clicks = sorted(
            v for (_, _, _, v, t) in rows if t == "click"
        )
        purch = sorted(v for (_, _, _, v, t) in rows if t == "purchase")
        if not clicks or not purch:
            assert res == []
            continue
        [r] = res
        assert (r.n_click, r.n_purchase) == (len(clicks), len(purch))
        # textbook binned two-sample CvM on the same 0.1 grid:
        # T = tc*tp/N^2 * sum_i w_i * (F1_i - F2_i)^2
        bins = sorted({math.floor(v * 10) for v in clicks + purch})
        tc, tp = len(clicks), len(purch)
        cc = cp = 0
        t_stat = 0.0
        for b in bins:
            nc = sum(1 for v in clicks if math.floor(v * 10) == b)
            np_ = sum(1 for v in purch if math.floor(v * 10) == b)
            cc += nc
            cp += np_
            t_stat += (nc + np_) * (cc / tc - cp / tp) ** 2
        t_stat *= tc * tp / (tc + tp) ** 2
        # ppm CDF floors drift each gap by <1e-6 each side
        assert abs(r.cvm_t_milli - t_stat * 1000.0) <= 2


def test_levene_bf_random_engine_parity_and_textbook(spark, tmp_path):
    import statistics

    rng = random.Random(435)
    for _ in range(3):
        rows = [
            (i + 1, rng.choice(["A", "N", "R"]),
             float(rng.randint(1, 50)))
            for i in range(40)
        ]
        _write(
            spark, tmp_path, "lineitem", rows,
            "l_orderkey long, l_returnflag string, l_quantity double",
        )
        [r] = (
            REG["stats_levene_brown_forsythe"].fn(spark, str(tmp_path)).collect()
        )
        [o] = _duck(
            tmp_path, "lineitem", REG["stats_levene_brown_forsythe"].sql
        )
        assert (r.n_groups, r.n_rows, r.bf_w_milli, r.eta_sq_ppm) == tuple(
            int(x) for x in o
        )
        # textbook Brown-Forsythe: ANOVA F on |v - group median|, here
        # in the repo's exact doubled-cents units |2v - 2*median|
        vals = defaultdict(list)
        for _, g, q in rows:
            vals[g].append(round(q * 100))
        devs = {
            g: [abs(2 * x - round(2 * statistics.median(v))) for x in v]
            for g, v in vals.items()
        }
        k = len(devs)
        n = sum(len(v) for v in devs.values())
        grand = sum(sum(v) for v in devs.values()) / n
        ssb = sum(
            len(v) * (sum(v) / len(v) - grand) ** 2 for v in devs.values()
        )
        ssw = sum(
            sum((x - sum(v) / len(v)) ** 2 for x in v) for v in devs.values()
        )
        f_lo = ((ssb - (k + 1)) / (k - 1)) / ((ssw + k + 1) / (n - k))
        f_hi = ((ssb + (k + 1)) / (k - 1)) / (max(ssw - (k + 1), 1) / (n - k))
        assert f_lo * 1000 - 1 <= r.bf_w_milli <= f_hi * 1000 + 1


def test_ks_drift_random_engine_parity_and_textbook(spark, tmp_path):
    rng = random.Random(436)
    for _ in range(3):
        rows = [
            (i + 1, 1, datetime.datetime(2024, 1, 1 + i % 28),
             rng.randint(0, 30) / 10.0,
             rng.choice(["click", "purchase", "view"]))
            for i in range(60)
        ]
        _write(spark, tmp_path, "events", rows, EV_SCHEMA)
        res = REG["agg_ks_drift"].fn(spark, str(tmp_path)).collect()
        ora = _duck(tmp_path, "events", REG["agg_ks_drift"].sql)
        assert [
            (r.ks_ppm, r.n_click, r.n_purchase) for r in res
        ] == [tuple(int(x) for x in row) for row in ora]
        clicks = [v for (_, _, _, v, t) in rows if t == "click"]
        purch = [v for (_, _, _, v, t) in rows if t == "purchase"]
        if not clicks or not purch:
            assert res == []
            continue
        [r] = res
        # textbook binned KS on the same 0.1 grid
        bins = sorted({math.floor(v * 10) for v in clicks + purch})
        tc, tp = len(clicks), len(purch)
        cc = cp = 0
        ks = 0.0
        for b in bins:
            cc += sum(1 for v in clicks if math.floor(v * 10) == b)
            cp += sum(1 for v in purch if math.floor(v * 10) == b)
            ks = max(ks, abs(cc / tc - cp / tp))
        # each ppm CDF floors by <1, the abs-gap and max by <=2 total
        assert abs(r.ks_ppm - ks * 1e6) <= 2


def test_spearman_random_tied_engine_parity_and_textbook(spark, tmp_path):
    rng = random.Random(437)
    for _ in range(3):
        rows = [
            (i + 1, rng.choice(["A", "N", "R"]),
             float(rng.randint(1, 8)), float(rng.randint(1, 8)))
            for i in range(45)
        ]
        _write(
            spark, tmp_path, "lineitem", rows,
            "l_orderkey long, l_returnflag string,"
            " l_quantity double, l_extendedprice double",
        )
        res = REG["stats_spearman"].fn(spark, str(tmp_path)).collect()
        ora = _duck(tmp_path, "lineitem", REG["stats_spearman"].sql)
        assert [
            (r.l_returnflag, r.n,
             int(r.spearman_ppm) if r.spearman_ppm is not None else None)
            for r in res
        ] == [
            (g, int(n), int(p) if p is not None else None)
            for (g, n, p) in ora
        ]
        # textbook: Pearson on average ranks per group (heavy ties)
        groups = defaultdict(list)
        for _, g, x, y in rows:
            groups[g].append((round(x * 100), round(y * 100)))
        expect = {}
        for g, pts in groups.items():
            px = _avg_positions([x for x, _ in pts])
            py = _avg_positions([y for _, y in pts])
            xs = [px[x] for x, _ in pts]
            ys = [py[y] for _, y in pts]
            n = len(pts)
            mx, my = sum(xs) / n, sum(ys) / n
            dx = sum((a - mx) ** 2 for a in xs)
            dy = sum((b - my) ** 2 for b in ys)
            num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
            expect[g] = (
                num / math.sqrt(dx * dy) if dx > 0 and dy > 0 else None
            )
        for r in res:
            e = expect[r.l_returnflag]
            if e is None:
                assert r.spearman_ppm is None
            else:
                assert abs(r.spearman_ppm - e * 1e6) <= 2


def test_welch_t_random_engine_parity_and_textbook(spark, tmp_path):
    rng = random.Random(438)
    for _ in range(3):
        rows = [
            (i + 1, 1, datetime.datetime(2024, 1, 1 + i % 28),
             rng.randint(50, 500) / 100.0,
             rng.choice(["click", "purchase", "view"]))
            for i in range(50)
        ]
        _write(spark, tmp_path, "events", rows, EV_SCHEMA)
        [r] = REG["agg_ttest_welch"].fn(spark, str(tmp_path)).collect()
        [o] = _duck(tmp_path, "events", REG["agg_ttest_welch"].sql)
        assert (r.t_ppm, r.n_click, r.n_purchase) == tuple(
            int(x) if x is not None else None for x in o
        )
        # textbook Welch t on exact cents
        a = [round(v * 100) for (_, _, _, v, t) in rows if t == "click"]
        b = [round(v * 100) for (_, _, _, v, t) in rows if t == "purchase"]
        assert (r.n_click, r.n_purchase) == (len(a), len(b))
        if len(a) > 1 and len(b) > 1:
            ma, mb = sum(a) / len(a), sum(b) / len(b)
            va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
            vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
            se2 = va / len(a) + vb / len(b)
            if se2 > 0:
                t = (ma - mb) / math.sqrt(se2)
                assert abs(r.t_ppm - t * 1e6) <= 2


def test_char_entropy_random_engine_parity_and_textbook(spark, tmp_path):
    rng = random.Random(439)
    alphabet = "abcde XY.!"
    for _ in range(3):
        rows = [
            (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40))),
             "en", "web", 0)
            for i in range(12)
        ]
        _write(
            spark, tmp_path, "documents", rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        res = REG["text_char_entropy"].fn(spark, str(tmp_path)).collect()
        ora = _duck(tmp_path, "documents", REG["text_char_entropy"].sql)
        assert [
            (r.doc_id, r.n_chars_total, r.n_distinct_chars,
             r.entropy_millibits)
            for r in res
        ] == [
            tuple(int(x) if x is not None else None for x in row)
            for row in ora
        ]
        # textbook Shannon entropy in bits per char
        expect = {}
        for d, text, *_ in rows:
            if not text:
                continue
            n = len(text)
            h = -sum(
                c / n * math.log2(c / n) for c in Counter(text).values()
            )
            expect[d] = h
        for r in res:
            if r.entropy_millibits is None:
                assert r.doc_id not in expect
                continue
            # nano-term floors + the final floor (no +0.5): within 1
            assert abs(r.entropy_millibits - expect[r.doc_id] * 1000) <= 1


def test_gini_random_engine_parity_and_mad_identity(spark, tmp_path):
    # independent check via the mean-absolute-difference form:
    # G = sum_ij |x_i - x_j| / (2 n^2 mu) — algebraically equal to the
    # implementation's rank form but computed with NO ranks at all
    rng = random.Random(440)
    for _ in range(3):
        rows = [
            (i + 1, rng.choice(["AUTO", "HOUSE"]),
             rng.randint(0, 50000) / 100.0)
            for i in range(30)
        ]
        _write(
            spark, tmp_path, "customer", rows,
            "c_custkey long, c_mktsegment string, c_acctbal double",
        )
        res = REG["agg_gini"].fn(spark, str(tmp_path)).collect()
        ora = _duck(tmp_path, "customer", REG["agg_gini"].sql)
        assert [
            (r.c_mktsegment, r.n_customers, r.sum_cents, r.gini_ppm)
            for r in res
        ] == [tuple(x if isinstance(x, str) else int(x) for x in row)
              for row in ora]
        groups = defaultdict(list)
        for _, seg, bal in rows:
            groups[seg].append(round(bal * 100))
        for r in res:
            xs = groups[r.c_mktsegment]
            n, s0 = len(xs), sum(xs)
            assert (r.n_customers, r.sum_cents) == (n, s0)
            if s0 == 0:
                assert r.gini_ppm is None
                continue
            mad = sum(abs(a - b) for a in xs for b in xs)  # includes i==j
            # rank-form numerator = mad/2 (identity); double-floor vs
            # exact integer division can differ by 1 at a boundary
            expect = (mad * 10**6) // (2 * n * s0)
            assert abs(r.gini_ppm - expect) <= 1


def test_theil_index_random_engine_parity_and_textbook(spark, tmp_path):
    rng = random.Random(444)
    for _ in range(3):
        custs = [
            (i + 1, rng.choice(["AUTO", "HOUSE"]))
            for i in range(12)
        ]
        _write(
            spark, tmp_path, "customer",
            [(c, seg, 0.0) for c, seg in custs],
            "c_custkey long, c_mktsegment string, c_acctbal double",
        )
        orders = [
            (oid, rng.choice(custs)[0], rng.randint(100, 90000) / 100.0)
            for oid in range(40)
        ]
        _write(
            spark, tmp_path, "orders", orders,
            "o_orderkey long, o_custkey long, o_totalprice double",
        )
        res = REG["agg_theil_index"].fn(spark, str(tmp_path)).collect()
        con = duckdb.connect()
        for t in ("customer", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
            )
        ora = con.execute(REG["agg_theil_index"].sql).fetchall()
        con.close()
        assert [
            (r.segment, r.n_customers, r.theil_ppb) for r in res
        ] == [(s, int(n), int(t)) for (s, n, t) in ora]
        # textbook T = mean of (x/mu) ln(x/mu) over positive spends
        seg_of = dict(custs)
        spend = defaultdict(int)
        for _, ck, price in orders:
            spend[ck] += round(price * 100)
        groups = defaultdict(list)
        for ck, cents in spend.items():
            if cents > 0:
                groups[seg_of[ck]].append(cents)
        for r in res:
            xs = groups[r.segment]
            mu = sum(xs) / len(xs)
            t = sum(x / mu * math.log(x / mu) for x in xs) / len(xs)
            # per-term ppb half-up rounding + the final integer DIV
            assert abs(r.theil_ppb - t * 1e9) <= 2


def test_benford_random_engine_parity_and_exact_histogram(spark, tmp_path):
    from rc_scanner_spark.queries.warehouse4 import _BENFORD_PPM

    rng = random.Random(445)
    for _ in range(3):
        rows = [
            (oid, 1, rng.randint(1, 999999) / 100.0)
            for oid in range(80)
        ]
        _write(
            spark, tmp_path, "orders", rows,
            "o_orderkey long, o_custkey long, o_totalprice double",
        )
        res = REG["profile_benford"].fn(spark, str(tmp_path)).collect()
        ora = _duck(tmp_path, "orders", REG["profile_benford"].sql)
        assert [
            (r.digit, r.obs, r.obs_ppm, r.expected_ppm, r.dev_ppm)
            for r in res
        ] == [tuple(int(x) for x in row) for row in ora]
        # exact first-digit histogram from the integer-cents string
        hist = Counter(str(round(p * 100))[0] for (_, _, p) in rows)
        n = len(rows)
        assert {str(r.digit): r.obs for r in res} == dict(hist)
        for r in res:
            expect_ppm = (r.obs * 10**6) // n
            assert abs(r.obs_ppm - expect_ppm) <= 1  # double-floor seam
            assert r.expected_ppm == _BENFORD_PPM[r.digit]
            assert r.dev_ppm == r.obs_ppm - r.expected_ppm


def test_wilson_ci_random_engine_parity_and_textbook(spark, tmp_path):
    from rc_scanner_spark.queries.warehouse7 import (
        _WILSON_MIN_CHARS,
        _WILSON_Z,
    )

    rng = random.Random(446)
    for _ in range(3):
        rows = [
            (i, "t", "en", rng.choice(["web", "books"]),
             rng.randint(0, 600))
            for i in range(40)
        ]
        _write(
            spark, tmp_path, "documents", rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        res = REG["stats_wilson_ci"].fn(spark, str(tmp_path)).collect()
        ora = _duck(tmp_path, "documents", REG["stats_wilson_ci"].sql)
        assert [
            (r.source, r.n, r.k, r.lo_ppm, r.hi_ppm) for r in res
        ] == [tuple(x if isinstance(x, str) else int(x) for x in row)
              for row in ora]
        # textbook Wilson interval on exact counts (_WILSON_Z is the
        # SQL-embeddable string literal)
        z = float(_WILSON_Z)
        stats = defaultdict(lambda: [0, 0])
        for _, _, _, src, nc in rows:
            stats[src][0] += 1
            stats[src][1] += 1 if nc >= _WILSON_MIN_CHARS else 0
        for r in res:
            n, k = stats[r.source]
            assert (r.n, r.k) == (n, k)
            p = k / n
            center = p + z * z / (2 * n)
            delta = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
            denom = 1 + z * z / n
            assert abs(r.lo_ppm - (center - delta) / denom * 1e6) <= 1
            assert abs(r.hi_ppm - (center + delta) / denom * 1e6) <= 1


def test_ols_group_random_engine_parity_and_textbook(spark, tmp_path):
    rng = random.Random(447)
    for _ in range(3):
        parts = [(pk, rng.choice(["B1", "B2"])) for pk in range(1, 7)]
        _write(
            spark, tmp_path, "part", parts,
            "p_partkey long, p_brand string",
        )
        li = [
            (rng.randint(1, 6), rng.randint(0, 10) / 100.0,
             float(rng.randint(1, 50)))
            for _ in range(60)
        ]
        _write(
            spark, tmp_path, "lineitem", li,
            "l_partkey long, l_discount double, l_quantity double",
        )
        res = REG["stats_ols_group"].fn(spark, str(tmp_path)).collect()
        con = duckdb.connect()
        for t in ("part", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
            )
        ora = con.execute(REG["stats_ols_group"].sql).fetchall()
        con.close()
        assert [
            (r.p_brand, r.n, r.slope_micro, r.intercept_milli, r.r2_ppm)
            for r in res
        ] == [
            tuple(
                x if isinstance(x, str) else (int(x) if x is not None else None)
                for x in row
            )
            for row in ora
        ]
        # textbook least squares on exact integer (x, y) points
        brand_of = dict(parts)
        groups = defaultdict(list)
        for pk, disc, qty in li:
            groups[brand_of[pk]].append((round(disc * 100), round(qty)))
        for r in res:
            pts = groups[r.p_brand]
            n = len(pts)
            assert r.n == n
            mx = sum(x for x, _ in pts) / n
            my = sum(y for _, y in pts) / n
            vx = sum((x - mx) ** 2 for x, _ in pts)
            vy = sum((y - my) ** 2 for _, y in pts)
            cov = sum((x - mx) * (y - my) for x, y in pts)
            if vx <= 0:
                assert r.slope_micro is None
                continue
            slope = cov / vx
            assert abs(r.slope_micro - slope * 1e6) <= 2
            assert abs(r.intercept_milli - (my - slope * mx) * 1000) <= 2
            if vy > 0:
                r2 = cov * cov / (vx * vy)
                assert abs(r.r2_ppm - r2 * 1e6) <= 2
            else:
                assert r.r2_ppm is None


def test_mcnemar_random_engine_parity_and_textbook(spark, tmp_path):
    rng = random.Random(448)
    for _ in range(3):
        rows = [
            (i + 1, rng.randint(1, 8),
             datetime.datetime(2024, 1, 1 + i % 28, rng.randint(0, 23)),
             rng.randint(100, 999) / 100.0,
             rng.choice(["purchase", "view", "click"]))
            for i in range(60)
        ]
        _write(spark, tmp_path, "events", rows, EV_SCHEMA)
        [r] = REG["stats_mcnemar"].fn(spark, str(tmp_path)).collect()
        [o] = _duck(tmp_path, "events", REG["stats_mcnemar"].sql)
        assert (
            r.n_never, r.n_post_only, r.n_pre_only, r.n_both,
            r.mcnemar_chi2_milli,
        ) == tuple(int(x) if x is not None else None for x in o)
        # full plain-Python replica: epoch midpoint (min+max)//2 us,
        # per-user pre/post purchase flags, continuity-corrected chi2
        us = [int(ts.timestamp() * 1_000_000) for (_, _, ts, _, _) in rows]
        mid = (min(us) + max(us)) // 2
        users = defaultdict(lambda: [0, 0])
        for (_, uid, ts, _, et), u in zip(rows, us):
            p = 1 if et == "purchase" else 0
            if u <= mid:
                users[uid][0] = max(users[uid][0], p)
            else:
                users[uid][1] = max(users[uid][1], p)
        cells = Counter(tuple(v) for v in users.values())
        b, c = cells[(1, 0)], cells[(0, 1)]
        assert (r.n_never, r.n_post_only, r.n_pre_only, r.n_both) == (
            cells[(0, 0)], c, b, cells[(1, 1)],
        )
        if b + c > 0:
            chi2 = (abs(b - c) - 1.0) ** 2 / (b + c)
            assert r.mcnemar_chi2_milli == math.floor(chi2 * 1000 + 0.5)
        else:
            assert r.mcnemar_chi2_milli is None
