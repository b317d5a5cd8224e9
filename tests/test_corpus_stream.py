"""Streaming incremental corpus builder + compaction maintenance.

The corpus stream must converge to exactly the batch dedup result
regardless of how documents are split across micro-batches, and a
replayed (retried) batch must not double-append.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F


def _write_doc_batches(spark, tmp_path, batches):
    src = str(tmp_path / "incoming")
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string"
        )
        df.coalesce(1).write.mode("append").parquet(src)
    return src


@pytest.mark.slow  # certification lane
def test_corpus_stream_matches_batch_dedup(spark, tmp_path):
    from rc_scanner_spark.streaming.corpus import (
        build_corpus_stream,
        read_corpus,
    )

    # 9 docs, 3 distinct texts: dups within a batch AND across batches
    rows = [
        (1, "alpha beta gamma", "en", "s"),
        (2, "alpha beta gamma", "en", "s"),      # dup of 1, same batch
        (3, "delta epsilon zeta", "en", "s"),
        (4, "alpha  beta   gamma", "en", "s"),   # dup of 1 (whitespace)
        (5, "eta theta iota", "en", "s"),
        (6, "delta epsilon zeta", "en", "s"),    # dup of 3, later batch
        (7, "ALPHA BETA GAMMA", "en", "s"),      # dup of 1 (case)
        (8, "kappa lambda mu", "en", "s"),
        (9, "eta theta iota", "en", "s"),        # dup of 5
    ]
    src = _write_doc_batches(spark, tmp_path, [rows[:3], rows[3:6], rows[6:]])
    schema = "doc_id bigint, text string, lang string, source string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    corpus_dir = str(tmp_path / "corpus")
    q = build_corpus_stream(
        stream, corpus_dir, str(tmp_path / "ckpt")
    ).start()
    q.processAllAvailable()
    q.stop()

    got = read_corpus(spark, corpus_dir)
    rows_out = got.select("doc_id", "fp").collect()
    # one survivor per distinct normalized text, regardless of which
    # micro-batch order the files were picked up in
    from rc_scanner_spark.operators.text import fingerprint

    expected_fps = {
        r["fp"]
        for r in spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string"
        )
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .collect()
    }
    assert {r["fp"] for r in rows_out} == expected_fps
    assert len(rows_out) == len(expected_fps) == 4


def test_corpus_batch_replay_is_idempotent(spark, tmp_path):
    from rc_scanner_spark.streaming.corpus import merge_batch, read_corpus

    rows = [(1, "some novel text", "en", "s"), (2, "other text", "en", "s")]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    corpus_dir = str(tmp_path / "corpus")
    merge_batch(df, 0, corpus_dir)
    n1 = read_corpus(spark, corpus_dir).count()
    # retry of the SAME batch id overwrites its own partition
    merge_batch(df, 0, corpus_dir)
    assert read_corpus(spark, corpus_dir).count() == n1 == 2
    # a new batch with the same content appends nothing
    merge_batch(df, 1, corpus_dir)
    assert read_corpus(spark, corpus_dir).count() == 2


def test_compaction_reduces_file_count(spark, tmp_path):
    from rc_scanner_spark.operators.maintenance import compact_to, dir_bytes

    src = str(tmp_path / "shattered")
    spark.range(0, 10000).withColumn("payload", F.md5(F.col("id").cast("string"))) \
        .repartition(32).write.mode("overwrite").parquet(src)
    dst = str(tmp_path / "compacted")
    n = compact_to(spark, src, dst, target_bytes=dir_bytes(src))
    assert n == 1
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b


def test_progress_capture_counts_rows_and_state(spark, tmp_path):
    """The listener must see every input row across micro-batches and
    report bounded dedup state for a bounded key set."""
    import time

    from rc_scanner_spark.streaming.metrics import ProgressCapture

    cap = ProgressCapture()
    spark.streams.addListener(cap)
    try:
        rows = [(i, f"t{i % 4}") for i in range(20)]
        df = spark.createDataFrame(rows, "id bigint, title string")
        src = str(tmp_path / "metrics_src")
        df.repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema("id bigint, title string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = stream.dropDuplicates(["title"])
        q = (
            out.writeStream.format("memory")
            .queryName("metrics_sink")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_metrics"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # listener events are delivered asynchronously
        for _ in range(40):
            if cap.total_rows() >= 20:
                break
            time.sleep(0.25)
        assert cap.total_rows() == 20
        assert len(cap.batches) >= 2          # maxFilesPerTrigger split it
        assert 0 < cap.max_state_rows() <= 4  # dedup state bounded by titles
    finally:
        spark.streams.removeListener(cap)


def test_corpus_stream_prep_gates_and_scrubs(spark, tmp_path):
    """With the quality+PII prep hook: short docs never reach the
    corpus, emails are redacted BEFORE fingerprinting (so two docs
    differing only in their PII dedup to one surviving row)."""
    from rc_scanner_spark.streaming.corpus import (
        build_corpus_stream,
        quality_scrub_prep,
        read_corpus,
    )

    rows = [
        (1, "contact alice@example.com about the quarterly report today", "en", "s"),
        (2, "contact bob@example.com about the quarterly report today", "en", "s"),
        (3, "too short", "en", "s"),
        (4, "an entirely different and sufficiently long document here", "en", "s"),
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string, lang string, source string")
        .parquet(src)
    )
    corpus_dir = str(tmp_path / "corpus")
    q = build_corpus_stream(
        stream, corpus_dir, str(tmp_path / "ckpt"), prep=quality_scrub_prep()
    ).start()
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"]: r["text"] for r in read_corpus(spark, corpus_dir).collect()}
    assert 3 not in got                       # quality-gated
    assert len({1, 2} & set(got)) == 1        # PII-equal docs deduped to one
    surviving_pii_doc = (({1, 2} & set(got))).pop()
    assert "<EMAIL>" in got[surviving_pii_doc]
    assert "example.com" not in got[surviving_pii_doc]
    assert 4 in got


@pytest.mark.slow  # certification lane
def test_corpus_stream_neardup_drops_cross_batch_near_copies(spark, tmp_path):
    """A later batch's lightly-perturbed copy of an earlier doc is
    dropped by the signature-sidecar near-dup check even though its
    exact fingerprint differs; novel docs still land."""
    from rc_scanner_spark.streaming.corpus import (
        build_corpus_stream_neardup,
        read_corpus,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to find some tasty food for "
        "its hungry little cubs before the night falls over the hills"
    )
    near = base.replace("tasty", "delicious")  # 1-word perturbation
    novel = (
        "completely different content about distributed query engines "
        "processing enormous datasets with columnar storage formats and "
        "adaptive execution strategies for modern analytics workloads"
    )
    batch1 = [(1, base, "en", "s"), (2, novel, "en", "s")]
    other = (
        "meanwhile a separate report describes oceanic current patterns "
        "shifting across hemispheres as seasonal temperature gradients "
        "redistribute thermal energy between latitudes every single year"
    )
    batch2 = [(3, near, "en", "s"), (4, other, "en", "s")]
    src = _write_doc_batches(spark, tmp_path, [batch1, batch2])
    schema = "doc_id bigint, text string, lang string, source string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    corpus_dir = str(tmp_path / "corpus_nd")
    sig_dir = str(tmp_path / "sigs_nd")
    q = build_corpus_stream_neardup(
        stream, corpus_dir, sig_dir, str(tmp_path / "ckpt_nd")
    ).start()
    q.processAllAvailable()
    q.stop()

    kept = {r["doc_id"] for r in read_corpus(spark, corpus_dir).collect()}
    assert 1 in kept and 2 in kept
    assert 3 not in kept, "near-copy of doc 1 must be suppressed"
    assert 4 in kept, "genuinely different doc must survive"
    # sidecar mirrors the kept set
    sigs = {r["id"] for r in spark.read.parquet(sig_dir).collect()}
    assert sigs == kept


def test_neardup_batch_replay_is_idempotent(spark, tmp_path):
    """A retried merge_batch_neardup must not self-suppress: the
    retry's docs would near-match their OWN previous attempt's
    signatures unless that partition is excluded from both the corpus
    and sidecar seen-sets."""
    from rc_scanner_spark.streaming.corpus import (
        merge_batch_neardup,
        read_corpus,
    )

    text = (
        "an entirely ordinary paragraph about testing retried stream "
        "batches with signature sidecars in a distributed corpus builder"
    )
    df = spark.createDataFrame(
        [(1, text, "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    )
    corpus_dir = str(tmp_path / "corpus_r")
    sig_dir = str(tmp_path / "sigs_r")
    merge_batch_neardup(df, 0, corpus_dir, sig_dir)
    assert read_corpus(spark, corpus_dir).count() == 1
    # retry same batch id: doc must survive (its own prior signatures
    # are excluded), partition overwritten not doubled
    merge_batch_neardup(df, 0, corpus_dir, sig_dir)
    assert read_corpus(spark, corpus_dir).count() == 1
    assert spark.read.parquet(sig_dir).count() == 1
