"""Planted-semantics tests for the round-6 warehouse16 batch
(Hamilton quotas, winsorized mean).

Hand-computed tiny fixtures — the oracle gate can't catch a semantic
flaw mirrored into the SQL twin, these can.
"""

from __future__ import annotations

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture


def test_sample_quota_hamilton_planted(spark, tmp_path):
    # sources a/b/c with 5/3/2 docs of 10 total, budget 100:
    # exact shares 50/30/20 -> no remainders, no bonus seats
    rows = (
        [(i, "a") for i in range(5)]
        + [(10 + i, "b") for i in range(3)]
        + [(20 + i, "c") for i in range(2)]
    )
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, source string",
    )
    out = {
        r.source: (r.base, r.bonus, r.quota)
        for r in REG["sample_quota_hamilton"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {"a": (50, 0, 50), "b": (30, 0, 30), "c": (20, 0, 20)}


def test_sample_quota_hamilton_remainders(spark, tmp_path):
    # 3 sources x 1 doc, budget 100: base 33 each, leftover 1 seat;
    # remainders tie -> alphabetical tiebreak gives the seat to 'a';
    # quotas must sum to exactly 100
    rows = [(1, "a"), (2, "b"), (3, "c")]
    _write(
        spark, tmp_path, "documents", rows,
        "doc_id long, source string",
    )
    out = {
        r.source: r.quota
        for r in REG["sample_quota_hamilton"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {"a": 34, "b": 33, "c": 33}
    assert sum(out.values()) == 100


def test_agg_winsorized_mean_planted(spark, tmp_path):
    # segment A: one huge outlier; with 5 values the p95 cut
    # interpolates near the top value and p5 near the bottom —
    # replay the interpolated cuts exactly
    vals = [1.00, 2.00, 3.00, 4.00, 1000.00]
    rows = [(i + 1, "A", v) for i, v in enumerate(vals)]
    _write(
        spark, tmp_path, "customer", rows,
        "c_custkey long, c_mktsegment string, c_acctbal double",
    )
    [r] = REG["agg_winsorized_mean"].fn(spark, str(tmp_path)).collect()
    cents = sorted(int(v * 100) for v in vals)

    def q(p):
        # linear interpolation (percentile/quantile_cont semantics)
        idx = p * (len(cents) - 1)
        lo, hi = int(idx), min(int(idx) + 1, len(cents) - 1)
        return int(cents[lo] + (idx - lo) * (cents[hi] - cents[lo]))

    lo, hi = q(0.05), q(0.95)
    clamped = [max(lo, min(hi, c)) for c in cents]
    assert r.n_customers == 5
    assert r.wsum_cents == sum(clamped)
    assert r.winsorized_mean_millicents == (sum(clamped) * 1000) // 5
    # the outlier must actually have been clamped
    assert r.wsum_cents < sum(cents)
