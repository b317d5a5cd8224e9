"""Randomized cross-engine replay of the distributed rank machinery
(Mann-Whitney / Kruskal-Wallis) against independent textbook
implementations.

The oracle gate can't catch a flaw mirrored into BOTH twins, and the
planted tests pin only hand-picked inputs.  These trials draw random
heavily-tied samples (seeded — deterministic across runs), then
assert two properties per draw:

1. ENGINE PARITY, exact: the Spark result equals the DuckDB twin's
   bit-for-bit (the property the round-10 NULL-ordering fix protects —
   random tied inputs exercise the bucket/offset/running-sum rank path
   far more densely than the sf data does).
2. TEXTBOOK AGREEMENT, bounded: the statistic matches a plain-Python
   average-rank implementation within the documented integer-DIV
   floor bias (each per-group quotient truncates by <1, so H drifts
   by at most 12k/(N(N+1)) plus the final half-up rounding; z_milli
   has no DIV step and must match to the rounding).
"""

from __future__ import annotations

import pytest
pytestmark = pytest.mark.slow  # certification lane (pytest.ini)


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


def _avg_positions(values):
    """value -> average 1-based rank position (textbook tie handling)."""
    pos, i = {}, 0
    for v, grp in groupby(sorted(values)):
        c = len(list(grp))
        pos[v] = i + (c + 1) / 2
        i += c
    return pos


def _duck(tmp_path, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


def _mk_rows(rng, groups, n, vmax):
    import datetime

    rows = []
    for i in range(n):
        g = rng.choice(groups)
        v = float(rng.randint(0, vmax))  # small domain -> heavy ties
        ts = datetime.datetime(2024, 1, 1 + i % 28)
        rows.append((i + 1, 1, ts, v, g))
    return rows


def test_kruskal_wallis_random_tied_engine_parity_and_textbook(
    spark, tmp_path
):
    rng = random.Random(421)
    for _ in range(3):
        rows = _mk_rows(rng, ["A", "B", "C"], n=30, vmax=5)
        _write(spark, tmp_path, "events", rows, EV_SCHEMA)
        [r] = REG["stats_kruskal_wallis"].fn(spark, str(tmp_path)).collect()
        [o] = _duck(tmp_path, REG["stats_kruskal_wallis"].sql)
        # exact engine parity on every output column
        assert (
            r.n_groups, r.n_rows, r.tie_term, r.h_milli, r.h_corr_milli
        ) == tuple(int(x) for x in o)
        # textbook H with average ranks
        pairs = [(g, v) for (_, _, _, v, g) in rows]
        pos = _avg_positions([v for _, v in pairs])
        sums, ns = defaultdict(float), Counter()
        for g, v in pairs:
            sums[g] += pos[v]
            ns[g] += 1
        n = len(pairs)
        h = (
            12.0 / (n * (n + 1)) * sum(sums[g] ** 2 / ns[g] for g in sums)
            - 3.0 * (n + 1)
        )
        tie = sum(c**3 - c for c in Counter(v for _, v in pairs).values())
        assert r.tie_term == tie
        # DIV floor bias: <1 per group quotient -> <=12k/(N(N+1)) on H,
        # + 0.5 milli final rounding
        tol = 12000.0 * len(sums) / (n * (n + 1)) + 1
        assert abs(r.h_milli - h * 1000.0) <= tol
        corr = 1.0 - tie / (n**3 - n)
        if corr > 0:
            assert abs(r.h_corr_milli - h / corr * 1000.0) <= tol / corr
        else:
            assert r.h_corr_milli is None


def test_mann_whitney_random_tied_engine_parity_and_textbook(
    spark, tmp_path
):
    import math

    rng = random.Random(422)
    for _ in range(3):
        # only click/view participate (the registry's group rule)
        rows = _mk_rows(rng, ["click", "view", "error"], n=30, vmax=4)
        _write(spark, tmp_path, "events", rows, EV_SCHEMA)
        [r] = REG["stats_mann_whitney"].fn(spark, str(tmp_path)).collect()
        [o] = _duck(tmp_path, REG["stats_mann_whitney"].sql)
        assert (r.n_a, r.n_b, r.u2_a, r.tie_term, r.z_milli) == tuple(
            int(x) for x in o
        )
        pairs = [
            (g, v) for (_, _, _, v, g) in rows if g in ("click", "view")
        ]
        pos = _avg_positions([v for _, v in pairs])
        ra = sum(pos[v] for g, v in pairs if g == "click")
        na = sum(1 for g, _ in pairs if g == "click")
        nb = len(pairs) - na
        u_a = ra - na * (na + 1) / 2
        assert r.u2_a == round(2 * u_a)
        n = na + nb
        tie = sum(c**3 - c for c in Counter(v for _, v in pairs).values())
        assert r.tie_term == tie
        var = na * nb / 12.0 * ((n + 1) - tie / (n * (n - 1)))
        if var > 0:
            z = (u_a - na * nb / 2.0) / math.sqrt(var)
            # no DIV step in z: only the final floor(+0.5) rounding
            assert abs(r.z_milli - z * 1000.0) <= 1
        else:
            assert r.z_milli is None
