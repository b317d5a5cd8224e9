"""Semantic invariants for the warehouse/retrieval family beyond the
oracle-parity hash check (tests/test_oracle_parity.py covers exact
equivalence; these pin properties the hash alone would not explain)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rc_scanner_spark.queries.warehouse import (
    _PR_DAMPING,
    q_graph_pagerank,
    q_merge_upsert,
    q_scd2_user_state,
    q_text_bm25_topk,
)

from tests.conftest import SF_ORACLE


@pytest.mark.slow  # certification lane
def test_pagerank_is_a_distribution(spark):
    """Ranks must sum to ~1 (every node has outdeg >= 1 here, so no
    dangling mass leaks) and all be positive, i.e. the iteration
    really is a stochastic-matrix power step, not just 'some scores'."""
    ranks = q_graph_pagerank(spark, SF_ORACLE)
    total = ranks.agg(F.sum("rank_r").alias("s")).collect()[0]["s"]
    assert total == pytest.approx(1.0, abs=1e-3)
    assert ranks.filter(F.col("rank_r") <= 0).count() == 0
    # teleport floor: no rank below (1-d)/N
    n = ranks.count()
    floor = (1.0 - _PR_DAMPING) / n - 1e-6
    assert ranks.filter(F.col("rank_r") < floor).count() == 0


def test_scd2_intervals_chain_per_user(spark):
    """Intervals must tile each user's history: exactly one current
    (open-ended) row per user, each close equals the next open, and
    observation counts add back up to the user's event count."""
    iv = q_scd2_user_state(spark, SF_ORACLE).cache()
    try:
        per_user = iv.groupBy("user_id").agg(
            F.sum(F.col("is_current").cast("int")).alias("n_current"),
            F.sum("n_obs").alias("n_obs"),
        )
        assert per_user.filter(F.col("n_current") != 1).count() == 0
        events = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
        ev_counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))
        mismatched = per_user.join(ev_counts, "user_id").filter(
            F.col("n_obs") != F.col("n_ev")
        )
        assert mismatched.count() == 0
        # adjacent intervals: valid_to of row k == valid_from of row k+1
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id").orderBy("valid_from_us")
        gaps = iv.withColumn(
            "next_from", F.lead("valid_from_us").over(w)
        ).filter(F.col("valid_to_us") != F.col("next_from"))
        assert gaps.count() == 0
    finally:
        iv.unpersist(blocking=False)


def test_merge_actions_partition_the_keyspace(spark):
    """Every (user, type) key appears exactly once with exactly one
    action, and totals equal the plain per-key event counts."""
    m = q_merge_upsert(spark, SF_ORACLE).cache()
    try:
        assert m.groupBy("user_id", "event_type").count().filter(
            F.col("count") > 1
        ).count() == 0
        events = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
        truth = events.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("n")
        )
        joined = m.join(truth, ["user_id", "event_type"], "full_outer")
        assert joined.filter(
            F.col("total_events") != F.col("n")
        ).count() == 0
    finally:
        m.unpersist(blocking=False)


def test_bm25_ranks_are_dense_and_ordered(spark):
    """Per query: ranks are 1..k dense, scores non-increasing in rank,
    and every returned doc actually contains >=1 query term."""
    res = q_text_bm25_topk(spark, SF_ORACLE).cache()
    try:
        rows = res.collect()
        by_q: dict[str, list] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        assert set(by_q) == {"q1", "q2", "q3"}
        for q, rs in by_q.items():
            rs.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
            scores = [r["score_r"] for r in rs]
            assert scores == sorted(scores, reverse=True)
            assert all(s > 0 for s in scores)
    finally:
        res.unpersist(blocking=False)


def test_rrf_fusion_mechanism(spark, duck):
    """RRF invariants beyond the oracle hash: per-query top-k shape,
    contiguous ranks, and the fusion property — a doc present in BOTH
    arms' top-k outranks a doc with the same single-arm rank that
    appears in only one arm."""
    from rc_scanner_spark.queries.warehouse import (
        _RRF_K,
        _RRF_TOPK,
        q_retrieval_rrf_fusion,
    )

    fused = q_retrieval_rrf_fusion(spark, SF_ORACLE).collect()
    by_q = {}
    for r in fused:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {"q1", "q2", "q3"}
    for q, rows in by_q.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1)), q
        assert len(rows) <= _RRF_TOPK
        # rrf scores non-increasing in rank
        ordered = sorted(rows, key=lambda r: r["rank"])
        scores = [r["rrf"] for r in ordered]
        assert scores == sorted(scores, reverse=True), q
    # fusion property: max possible single-arm score < min possible
    # both-arms score for equal ranks => any doc in both top-k arms
    # beats a doc at the same ranks in one arm only.
    single_best = 1.0 / (_RRF_K + 1)
    both_worst = 2.0 / (_RRF_K + _RRF_TOPK)
    assert both_worst > single_best


def test_retention_cohorts_day_zero_is_full(spark):
    from rc_scanner_spark.queries.warehouse import q_events_retention_cohorts

    from tests.conftest import SF_SMOKE

    rows = q_events_retention_cohorts(spark, SF_SMOKE).collect()
    day0 = [r for r in rows if r["day_offset"] == 0]
    # Every cohort's first day contains exactly the cohort itself.
    assert day0 and all(r["retention"] == 1.0 for r in day0)
    assert all(r["n_active"] == r["n_cohort"] for r in day0)
    # Offsets never precede the cohort day and rates never exceed 1.
    assert all(r["day_offset"] >= 0 and r["retention"] <= 1.0 for r in rows)


def test_basket_pairs_invariants(spark):
    from rc_scanner_spark.queries.warehouse import (
        _BASKET_MIN_SUPPORT,
        q_basket_part_pairs,
    )

    from tests.conftest import SF_SMOKE

    rows = q_basket_part_pairs(spark, SF_SMOKE).collect()
    assert rows, "sf0.001 should produce at least one frequent pair"
    assert all(r["pa"] < r["pb"] for r in rows)
    assert all(r["support"] >= _BASKET_MIN_SUPPORT for r in rows)
    assert all(r["lift"] > 0 for r in rows)


def test_pagerank_matches_python_power_iteration(spark, tmp_path):
    """Exact replay: the distributed PageRank must reproduce a plain
    Python power iteration (same damping, iteration count, uniform
    init, rank/outdeg contributions) on a planted 2-user x 2-type
    bipartite graph, to the 6-decimal output rounding."""
    import datetime

    from rc_scanner_spark.queries.warehouse import _PR_DAMPING, _PR_ITERS
    from tests.conftest import write_fixture

    d = datetime.datetime
    # user 1 -> {click, view}; user 2 -> {click}
    rows = [
        (1, 1, d(2026, 8, 1), 1.0, "click"),
        (2, 1, d(2026, 8, 1), 1.0, "view"),
        (3, 2, d(2026, 8, 1), 1.0, "click"),
        (4, 2, d(2026, 8, 2), 1.0, "click"),  # duplicate edge: distinct()
    ]
    write_fixture(
        spark, tmp_path, "events", rows,
        "event_id long, user_id long, ts timestamp, value double, "
        "event_type string",
    )
    got = {
        r.node: r.rank_r
        for r in q_graph_pagerank(spark, str(tmp_path)).collect()
    }

    edges = {
        "u:1": ["t:click", "t:view"],
        "u:2": ["t:click"],
        "t:click": ["u:1", "u:2"],
        "t:view": ["u:1"],
    }
    nodes = sorted(edges)
    rank = {v: 1.0 / len(nodes) for v in nodes}
    for _ in range(_PR_ITERS):
        inflow = {v: 0.0 for v in nodes}
        for src, dsts in edges.items():
            for dst in dsts:
                inflow[dst] += rank[src] / len(dsts)
        rank = {
            v: (1.0 - _PR_DAMPING) / len(nodes) + _PR_DAMPING * inflow[v]
            for v in nodes
        }
    expect = {v: round(rank[v], 6) for v in nodes}
    assert got == pytest.approx(expect, abs=2e-6)
