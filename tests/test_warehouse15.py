"""Planted-semantics tests for the round-6 warehouse15 batch
(SCD2 audit, revenue bridge, exact-dup vectors).

Hand-computed tiny fixtures — the oracle gate can't catch a semantic
flaw mirrored into the SQL twin, these can.
"""

from __future__ import annotations

import datetime

from rc_scanner_spark.queries import build_registry

from tests.conftest import write_fixture

REG = build_registry()
_write = write_fixture


def test_scd2_consistency_audit_planted(spark, tmp_path):
    d = datetime.datetime
    rows = [
        # user 1: a -> b -> a (three islands), user 2: single state
        (1, 1, d(2020, 1, 1), "a"),
        (2, 1, d(2020, 1, 2), "a"),
        (3, 1, d(2020, 1, 3), "b"),
        (4, 1, d(2020, 1, 4), "a"),
        (5, 2, d(2020, 1, 1), "x"),
    ]
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    [r] = REG["scd2_consistency_audit"].fn(spark, str(tmp_path)).collect()
    # the gaps-and-islands build is correct by construction: every
    # violation counter must be zero, with both users audited
    assert (r.n_users, r.n_overlaps, r.n_gaps) == (2, 0, 0)
    assert (r.n_adjacent_same_state, r.n_bad_open_counts) == (0, 0)


def test_orders_revenue_bridge_planted(spark, tmp_path):
    d = datetime.datetime
    # span days 1..11 -> midpoint day 6: P1 = days <= 6
    _write(
        spark, tmp_path, "orders",
        [
            (1, d(2020, 1, 1)),
            (2, d(2020, 1, 11)),
        ],
        "o_orderkey long, o_orderdate timestamp",
    )
    # part 10: P1 q=2 r=200; P2 q=3 r=450
    #   volume = floor((3-2)*200/2) = 100 ; price = 450-200-100 = 150
    # part 20: only P2 (new): r2 = 500
    # part 30: only P1 (lost): r1 = 70
    _write(
        spark, tmp_path, "lineitem",
        [
            (1, 10, 2.0, 2.0, 0.0),
            (2, 10, 3.0, 4.5, 0.0),
            (2, 20, 1.0, 5.0, 0.0),
            (1, 30, 1.0, 0.7, 0.0),
        ],
        "l_orderkey long, l_partkey long, l_quantity double,"
        " l_extendedprice double, l_discount double",
    )
    _write(
        spark, tmp_path, "part",
        [(10, "T"), (20, "T"), (30, "T")],
        "p_partkey long, p_type string",
    )
    [r] = REG["orders_revenue_bridge"].fn(spark, str(tmp_path)).collect()
    assert (r.p_type, r.rev1_cents, r.rev2_cents) == ("T", 270, 950)
    assert r.volume_effect_cents == 100
    assert r.price_effect_cents == 150
    assert r.new_effect_cents == 500
    assert r.lost_effect_cents == 70
    # the bridge adds up exactly: delta = vol + price + new - lost
    assert (
        r.rev2_cents - r.rev1_cents
        == r.volume_effect_cents
        + r.price_effect_cents
        + r.new_effect_cents
        - r.lost_effect_cents
    )


def test_embed_exact_dup_vectors_planted(spark, tmp_path):
    v = [0.5] * 64
    rows = [
        (1, v, 0),
        (2, list(v), 0),            # exact duplicate of 1
        (3, [0.5] * 63 + [0.6], 0)  # differs in the last component
    ]
    _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    [r] = REG["embed_exact_dup_vectors"].fn(spark, str(tmp_path)).collect()
    assert (r.n_vectors, r.n_distinct_sigs, r.n_dup_vectors) == (3, 2, 1)
