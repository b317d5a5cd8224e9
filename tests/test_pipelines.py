"""End-to-end corpus preparation: every stage must show its effect on
planted data — quality-gated docs gone, exact dups collapsed, LSH
near-dup clusters reduced to canonicals, contaminated docs dropped,
survivors split and packed deterministically.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "additional tokens keep this document comfortably above every "
    "minimum length gate in the pipeline today"
)


def test_prepare_corpus_stage_effects(spark, tmp_path):
    from rc_scanner_spark.pipelines import prepare_corpus, write_shards

    rows = [
        (1, BASE + " one", "en", "srcA", 0),
        (2, BASE + " one", "en", "srcA", 0),            # exact dup of 1
        (3, BASE + " one extra", "en", "srcA", 0),      # near dup of 1
        (4, "tiny", "en", "srcA", 0),                   # fails quality gate
        (5, "a completely different legal document about maritime law and "
            "its many fascinating jurisdictional edge cases near coastal "
            "waters everywhere", "en", "srcB", 0),
        (6, "benchmark eval question about the meaning of life and other "
            "things that models should never have memorized from their "
            "training corpus at all", "en", "srcB", 0),  # contaminated
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    bench = spark.createDataFrame(
        [(100, rows[5][1], "en", "bench", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = prepare_corpus(spark, docs, bench_docs=bench)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}

    assert 4 not in got                      # quality gate
    assert 2 not in got                      # exact dedup
    assert 3 not in got                      # near-dedup via LSH + CC
    assert 6 not in got                      # decontamination
    assert set(got) == {1, 5}
    for r in got.values():
        assert r["split"] in ("train", "val")
        assert 0 <= r["shard"] < 8
        assert r["first_seq"] <= r["last_seq"]

    dst = str(tmp_path / "shards")
    write_shards(out, dst)
    back = spark.read.parquet(dst)
    assert {r["doc_id"] for r in back.collect()} == {1, 5}
    assert set(back.columns) >= {"doc_id", "split", "shard", "n_tokens"}


@pytest.mark.slow  # certification lane
def test_prepare_corpus_is_deterministic(spark):
    from rc_scanner_spark.pipelines import prepare_corpus
    from rc_scanner_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(map(repr, prepare_corpus(spark, docs).collect()))
    b = sorted(map(repr, prepare_corpus(spark, docs.repartition(5)).collect()))
    assert a == b


def test_select_token_budget_invariants(spark):
    """Budget selection: total stays under budget, the kept set is a
    greedy quality-first prefix, and the boundary band cuts by doc_id."""
    from rc_scanner_spark.queries.llm import (
        _BUDGET_TOKENS,
        q_select_token_budget,
    )

    rows = q_select_token_budget(spark, "/root/testdata/sf0.001").collect()
    assert rows, "selection must be non-empty at the fixture scale"
    total = sum(r["n_tokens"] for r in rows)
    assert total <= _BUDGET_TOKENS
    assert max(r["cum_tokens"] for r in rows) == total
    # prefix property: every kept doc's quality band is >= the worst
    # kept band, and within the worst band the kept doc_ids form a
    # doc_id-ordered prefix (no gaps created by skipping a smaller doc).
    worst = min(r["quality_r"] for r in rows)
    kept_worst = sorted(r["doc_id"] for r in rows if r["quality_r"] == worst)
    from rc_scanner_spark.operators.text import quality_score, token_count
    from rc_scanner_spark.tables import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", quality_score(F.col("text")).alias("q")
    )
    all_worst = sorted(
        r["doc_id"] for r in d.filter(F.col("q") == worst).collect()
    )
    assert kept_worst == all_worst[: len(kept_worst)]


@pytest.mark.slow  # certification lane
def test_prepare_corpus_keep_best_prefers_longest(spark):
    from rc_scanner_spark.pipelines import prepare_corpus

    rows = [
        (1, BASE + " one", "en", "srcA", 0),            # near-dup cluster...
        (2, BASE + " one two three four", "en", "srcA", 0),  # ...longest member
        (9, "a completely different legal document about maritime law and "
            "its many fascinating jurisdictional edge cases near coastal "
            "waters everywhere", "en", "srcB", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, extra int"
    )
    first = {r["doc_id"] for r in prepare_corpus(spark, docs).collect()}
    best = {
        r["doc_id"]
        for r in prepare_corpus(spark, docs, keep="best").collect()
    }
    # Same cluster, different survivor policy.
    assert first == {1, 9}
    assert best == {2, 9}
