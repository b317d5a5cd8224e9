"""Ground truth for the mergeable-sketch queries and incremental dedup
(no SQL oracle for HLL: DuckDB's approx implementation differs, so the
numeric contract is pinned here instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rc_scanner_spark.queries.sketches import (
    q_sketch_hll_daily_rollup,
    q_sketch_hll_mergeable,
)
from rc_scanner_spark.tables import load_table

from .conftest import SF_SMOKE


def test_hll_mergeable_estimates_within_tolerance(spark):
    rows = q_sketch_hll_mergeable(spark, SF_SMOKE).collect()
    got = {r["event_type"]: (r["exact_users"], r["approx_ok"]) for r in rows}
    e = load_table(spark, SF_SMOKE, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = e.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, n in exact.items():
        # exact column is exact; approx_ok pins the lgK=12 sketch
        # estimate within 5% (~3 sigma at 1.6% RSE)
        assert got[k] == (n, True), (k, got[k], n)


def test_hll_partitioning_invariance(spark):
    """Sketch merge is commutative slot-max: the estimate must not
    depend on how the input was partitioned."""
    e0 = load_table(spark, SF_SMOKE, "events")
    e13 = e0.repartition(13, "user_id")
    ests = []
    for e in (e0, e13):
        per = e.groupBy("event_type").agg(
            F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
        )
        alt = per.select(
            "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
        )
        ests.append({r["event_type"]: r["approx_users"] for r in alt.collect()})
    assert ests[0] == ests[1]


def test_hll_daily_rollup_matches_exact_within_tolerance(spark):
    got = {
        r["day"]: (r["exact_users"], r["approx_ok"])
        for r in q_sketch_hll_daily_rollup(spark, SF_SMOKE).collect()
    }
    e = load_table(spark, SF_SMOKE, "events")
    exact = {
        r["day"]: r["n"]
        for r in e.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert got[k] == (n, True), (k, got[k], n)


def test_incremental_dedup_disjoint_from_corpus(spark):
    from rc_scanner_spark.operators.text import normalize
    from rc_scanner_spark.queries.llm import q_dedup_incremental

    kept = q_dedup_incremental(spark, SF_SMOKE)
    d = load_table(spark, SF_SMOKE, "documents")
    fps = d.select("doc_id", F.md5(normalize(F.col("text"))).alias("fp"))
    corpus_fps = {
        r["fp"] for r in fps.filter(F.col("doc_id") % 10 != 0).collect()
    }
    batch = fps.filter(F.col("doc_id") % 10 == 0)
    rows = kept.collect()
    # kept fingerprints never appear in the corpus
    assert all(r["fp"] not in corpus_fps for r in rows)
    # every batch doc is accounted for: kept groups + corpus-dropped
    n_dropped = batch.filter(F.col("fp").isin(list(corpus_fps))).count()
    assert sum(r["n_in_batch"] for r in rows) + n_dropped == batch.count()
    # survivor is the smallest id of its group
    for r in rows:
        group_min = (
            batch.filter(F.col("fp") == r["fp"]).agg(F.min("doc_id")).first()[0]
        )
        assert r["keep_id"] == group_min
