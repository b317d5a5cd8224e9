"""Round-12 planted tests: the basket-lift pair-build cap (brief #5)
and its data-model bound.

The uncapped pair build is quadratic in basket size by construction
(warehouse30.q_orders_basket_lift builds k*(k-1)/2 structs INSIDE one
row before explode), so a pathological million-item basket would
materialize ~5e11 in-row structs.  _BASKET_MAX_PARTS pins the sorted
prefix that enters the pair build; these tests prove (a) the cap
binds correctly and both engines agree when it does, and (b) the cap
never binds at the TPC-H data shape the registry runs on.
"""

from __future__ import annotations

import pytest

from rc_scanner_spark.queries import build_registry
from rc_scanner_spark.queries.warehouse30 import _BASKET_MAX_PARTS

from tests.conftest import write_fixture

REG = build_registry()

LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_returnflag string, "
    "l_quantity double, l_shipdate timestamp"
)
_TS = __import__("datetime").datetime(2024, 1, 1)


def _mirror(baskets: dict[int, set[int]]) -> dict:
    """Pure-Python basket-lift mirror WITH the sorted-prefix cap."""
    N = len(baskets)
    part_n: dict[int, int] = {}
    pair_n: dict[tuple[int, int], int] = {}
    for parts in baskets.values():
        for p in parts:  # part_n is UNCAPPED (matches both engines)
            part_n[p] = part_n.get(p, 0) + 1
        sp = sorted(parts)[:_BASKET_MAX_PARTS]
        for i, a in enumerate(sp):
            for b in sp[i + 1:]:
                pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    out = {}
    for (a, b), n in pair_n.items():
        if n < 2:
            continue
        out[(a, b)] = (
            n,
            part_n[a],
            part_n[b],
            n * 1_000_000 // part_n[a],
            n * N * 1_000_000 // (part_n[a] * part_n[b]),
        )
    return out


@pytest.mark.slow
def test_basket_lift_cap_binds_on_pathological_basket(spark, tmp_path):
    """A 400-distinct-part basket (cap 256 binds): pairs exist only
    among the first 256 sorted parts, part_n stays uncapped, and the
    Spark result matches the capped pure-Python mirror exactly."""
    k = _BASKET_MAX_PARTS + 144  # 400 distinct parts
    big = set(range(1000, 1000 + k))
    # two identical pathological baskets so surviving pairs hit the
    # n_pair >= 2 support floor; one small disjoint basket as control
    baskets = {1: big, 2: big, 3: {50, 60}, 4: {50, 60}}
    rows = []
    for ok, parts in baskets.items():
        for pk in sorted(parts):
            rows.append((ok, pk, 1, "N", 1.0, _TS))
    write_fixture(spark, tmp_path, "lineitem", rows, LI_SCHEMA)

    got = {
        (r.part_a, r.part_b): (
            r.n_pair, r.n_a, r.n_b, r.conf_a_to_b_ppm, r.lift_ppm
        )
        for r in REG["orders_basket_lift"].fn(spark, str(tmp_path)).collect()
    }
    expect = _mirror(baskets)
    assert got == expect
    # the cap actually bound: no pair may touch a part beyond the
    # 256-th sorted element of the big basket
    cut = sorted(big)[_BASKET_MAX_PARTS - 1]
    assert all(b <= cut or (a, b) == (50, 60) for a, b in got)
    n_big_pairs = _BASKET_MAX_PARTS * (_BASKET_MAX_PARTS - 1) // 2
    assert len(got) == n_big_pairs + 1  # capped pairs + the control


EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _emb_row(vid, dense):
    v = [0.0] * 64
    for i, x in dense.items():
        v[i] = x
    return (vid, v, 0)


def test_power_iter_portable_exact_diagonal(spark, tmp_path):
    """Known eigenstructure: C = diag(2.0, 0.5, 0, ...) built from
    four planted vectors.  96 power-iteration steps from v0=0.125
    drive the off-dominant component below double precision
    ((1/4)^96 = 2^-192), so top_eig is EXACTLY 2.0, trace 2.5, and
    the explained share floor(2.0/2.5 * 1e6 + 0.5) = 800000."""
    rows = [
        _emb_row(1, {0: 2.0}),
        _emb_row(2, {0: -2.0}),
        _emb_row(3, {1: 1.0}),
        _emb_row(4, {1: -1.0}),
    ]
    write_fixture(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    [r] = (
        REG["embed_power_iter_portable"].fn(spark, str(tmp_path)).collect()
    )
    assert (r.top_eig, r.cov_trace, r.explained_ppm) == (2.0, 2.5, 800000)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [61, 62])
def test_power_iter_random_replay(spark, tmp_path, seed):
    """Randomized pure-Python mirror (sequential sums, no numpy): the
    grid-snapped dominant eigenvalue, trace, and explained share must
    match the Spark/Arrow implementation exactly — the iteration is
    self-correcting, so independent accumulation orders agree far
    inside the 1e-6 grid."""
    import math
    import random

    rng = random.Random(seed)
    n = rng.randint(20, 50)
    rows = []
    vecs = []
    for vid in range(1, n + 1):
        v = [round(rng.uniform(-1, 1), 3) for _ in range(64)]
        vecs.append(v)
        rows.append((vid, v, 0))
    write_fixture(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)

    # pure-python covariance (float32 inputs widen exactly to double)
    d = 64
    fv = [[float(__import__("numpy").float32(x)) for x in v] for v in vecs]
    C = [[0.0] * d for _ in range(d)]
    mean = [sum(v[i] for v in fv) / n for i in range(d)]
    for i in range(d):
        for j in range(d):
            C[i][j] = (
                sum(v[i] * v[j] for v in fv) / n - mean[i] * mean[j]
            )
    v = [0.125] * d
    for _ in range(96):
        w = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        nrm = math.sqrt(sum(x * x for x in w))
        v = [x / nrm for x in w]
    cv = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
    lam = sum(v[i] * cv[i] for i in range(d))
    trace = sum(C[i][i] for i in range(d))
    eig_g = math.floor(lam * 1e6 + 0.5) / 1e6
    tr_g = math.floor(trace * 1e6 + 0.5) / 1e6
    [r] = (
        REG["embed_power_iter_portable"].fn(spark, str(tmp_path)).collect()
    )
    assert (r.top_eig, r.cov_trace, r.explained_ppm) == (
        eig_g,
        tr_g,
        math.floor(eig_g / tr_g * 1e6 + 0.5),
    )


def test_basket_cap_never_binds_at_registry_shape(spark):
    """The documented data-model bound: the synthetic generator is
    looser than strict TPC-H (measured max distinct parts/order: 7 at
    sf0.001, 13 at sf0.01, 17 at sf0.1 — growing ~log with SF), but
    every scale the registry runs on sits far under _BASKET_MAX_PARTS,
    so the cap is a pure safety rail for the registry's own data."""
    from pyspark.sql import functions as F

    from rc_scanner_spark.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    mx = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_partkey").alias("k"))
        .agg(F.max("k").alias("mx"))
        .collect()[0]["mx"]
    )
    assert mx < _BASKET_MAX_PARTS // 4, mx
