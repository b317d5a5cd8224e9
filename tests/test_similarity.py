"""Similarity-search ground truth: brute-force cosine vs numpy, LSH
recall vs brute force, HLL error bound (the approx_count_distinct
rows-only query)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rc_scanner_spark.operators.similarity import cosine_topk, lsh_ann_pairs

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_cosine_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["sim"]))
    for qid, hits in by_q.items():
        q = vecs[qid]
        sims = {
            vid: round(float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v))), 4)
            for vid, v in vecs.items()
        }
        expected = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        got_sorted = [(vid, s) for _, vid, s in sorted(hits)]
        assert [v for v, _ in got_sorted] == [v for v, _ in expected]
        for (gv, gs), (ev, es) in zip(got_sorted, expected):
            assert abs(gs - es) <= 1e-3  # rounding-at-4 tolerance


def test_lsh_finds_planted_near_duplicates(spark):
    # Hyperplane LSH collision probability per plane is 1 - theta/pi:
    # at cosine ~0.98 (planted dups) p^8 ~ 0.43/table -> 8 tables give
    # ~99% pair recall; at cosine ~0 (random 64-dim) candidates stay
    # rare.  So plant perturbed copies and require they come back.
    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 64))
    planted = []
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    for j in range(20):  # ids 100.. are small perturbations of 0..19
        twin = base[j] + 0.05 * rng.normal(size=64)
        rows.append((100 + j, [float(x) for x in twin]))
        planted.append((j, 100 + j))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_ann_pairs(df, num_planes=8, num_tables=8, threshold=0.9).collect()
    }
    found = sum(1 for p in planted if p in got)
    assert found / len(planted) >= 0.8
    # threshold verification is exact cosine -> nothing below 0.9 sneaks in
    vecs = {vid: np.array(v, dtype=np.float64) for vid, v in rows}
    for a, b in got:
        va, vb = vecs[a], vecs[b]
        sim = float(np.dot(va, vb) / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert sim >= 0.9 - 1e-3


def test_approx_distinct_error_bound(spark):
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in l.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in l.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.1


def test_ivf_topk_recall_vs_brute_force(spark, emb):
    from rc_scanner_spark.operators.similarity import ivf_topk

    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, num_cells=16, num_probes=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    # every query must come back with k results
    assert set(approx_sets) == set(exact_sets)
    assert all(len(v) == 5 for v in approx_sets.values())
    # 4 of 16 probed cells: require aggregate recall well above the
    # 25% a random probe would give
    hits = sum(len(exact_sets[q] & approx_sets[q]) for q in exact_sets)
    total = sum(len(exact_sets[q]) for q in exact_sets)
    assert hits / total >= 0.5, f"IVF recall {hits}/{total}"


@pytest.mark.slow  # certification lane
def test_kmeans_refine_matches_numpy_lloyd(spark):
    from rc_scanner_spark.operators.similarity import kmeans_refine

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 8))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids, assigned = kmeans_refine(df, num_cells=4, iters=3)

    # mirror the operator exactly: seeds = 4 smallest ids, cosine
    # argmax assign (ties -> lowest cell), per-dim mean rounded to 6
    v64 = np.array([r[1] for r in rows], dtype=np.float64)

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    cents = v64[:4].copy()
    for _ in range(3):
        cells = []
        for v in v64:
            sims = [round(cos(v, c), 6) for c in cents]
            cells.append(int(np.argmax(sims)))  # argmax takes first on ties
        cents = np.array(
            [
                np.round(v64[[i for i, c in enumerate(cells) if c == k]].mean(axis=0), 6)
                for k in range(4)
            ]
        )
    final = []
    for v in v64:
        sims = [round(cos(v, c), 6) for c in cents]
        final.append(int(np.argmax(sims)))

    got_assign = {r["id"]: r["cell"] for r in assigned.collect()}
    assert got_assign == {i: c for i, c in enumerate(final)}
    got_cents = {r["cell"]: np.array(r["cv"]) for r in centroids.collect()}
    assert set(got_cents) == {0, 1, 2, 3}
    for k in range(4):
        assert np.allclose(got_cents[k], cents[k], atol=1e-5)

    # determinism across re-runs (partitioning-order invariance)
    again = {r["id"]: r["cell"] for r in kmeans_refine(df, num_cells=4, iters=3)[1].collect()}
    assert again == got_assign


def test_ivf_assignment_is_deterministic_and_total(spark, emb):
    from rc_scanner_spark.operators.similarity import ivf_assign

    _, assigned = ivf_assign(emb, num_cells=8)
    n = emb.count()
    assert assigned.count() == n  # every vector lands in exactly one cell
    assert assigned.select("id").distinct().count() == n
    a = {r["id"]: r["cell"] for r in assigned.collect()}
    b = {r["id"]: r["cell"] for r in ivf_assign(emb, num_cells=8)[1].collect()}
    assert a == b


def test_semantic_dedup_prunes_planted_near_identical(spark):
    """Two near-identical vectors land in the same k-means cell; the
    higher id is pruned with dup_of = the lower id.  An orthogonal
    vector survives.  Every input id appears exactly once."""
    from rc_scanner_spark.operators.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        (4, [0.0, 0.0, 1.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["id"]: r for r in
           semantic_dedup(df, num_cells=3, iters=2, threshold=0.9).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[2]["dup_of"] == 1 and not out[2]["is_kept"]
    assert out[1]["is_kept"] and out[3]["is_kept"] and out[4]["is_kept"]


def test_semantic_dedup_blocking_is_cluster_local(spark, emb):
    """On the real embeddings table: survivors partition the input, a
    pruned id's dup_of is a smaller id in the SAME cell with cosine >=
    threshold (spot-verified against numpy)."""
    from rc_scanner_spark.operators.similarity import semantic_dedup

    out = semantic_dedup(emb, num_cells=8, iters=2, threshold=0.7).collect()
    assert len(out) == emb.count()
    by_id = {r["id"]: r for r in out}
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    pruned = [r for r in out if not r["is_kept"]]
    for r in pruned[:25]:
        other = by_id[r["dup_of"]]
        assert r["dup_of"] < r["id"]
        assert other["cell"] == r["cell"]
        a, b = vecs[r["id"]], vecs[r["dup_of"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert round(cos, 4) >= 0.7
