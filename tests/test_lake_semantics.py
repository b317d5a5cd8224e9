"""Data-lake write semantics the 100 TB pipeline depends on:

- dynamic partition overwrite: re-running one day's batch must replace
  ONLY that day's partition (the backfill contract for the K4-style
  date-partitioned sink);
- read-side schema evolution (mergeSchema): old files without a new
  column read as NULLs next to new files that have it.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_dynamic_partition_overwrite_backfills_one_day(spark, tmp_path):
    out = str(tmp_path / "by_day")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        day1 = [(1, "2026-08-01", "a"), (2, "2026-08-01", "b")]
        day2 = [(3, "2026-08-02", "c")]
        df = spark.createDataFrame(day1 + day2, "id bigint, day string, v string")
        df.write.mode("overwrite").partitionBy("day").parquet(out)

        # backfill day2 only: corrected row, day1 must survive untouched
        fix = spark.createDataFrame(
            [(30, "2026-08-02", "C-fixed")], "id bigint, day string, v string"
        )
        fix.write.mode("overwrite").partitionBy("day").parquet(out)

        # partition-column type inference reads the day string back as
        # a DATE; normalize for the comparison
        got = {
            (r["id"], str(r["day"]), r["v"])
            for r in spark.read.parquet(out).collect()
        }
        assert got == {
            (1, "2026-08-01", "a"),
            (2, "2026-08-01", "b"),
            (30, "2026-08-02", "C-fixed"),
        }
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")


def test_merge_schema_reads_old_files_with_nulls(spark, tmp_path):
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "x")], "id bigint, a string").write.mode(
        "append"
    ).parquet(out)
    spark.createDataFrame(
        [(2, "y", 9.5)], "id bigint, a string, score double"
    ).write.mode("append").parquet(out)

    df = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(df.columns) == {"id", "a", "score"}
    got = {r["id"]: r["score"] for r in df.collect()}
    assert got == {1: None, 2: 9.5}
    # and the evolved column is still filterable/aggregatable
    assert df.agg(F.sum("score")).collect()[0][0] == 9.5


def test_corrupt_json_records_are_quarantined_not_fatal(spark, tmp_path):
    """PERMISSIVE JSON reads must land malformed lines in
    _corrupt_record (per-record error containment, the C1 semantic at
    the source layer) instead of failing the scan."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"id": 1, "title": "ok"}\n'
        "{this is not json}\n"
        '{"id": 2, "title": "also ok"}\n'
        '{"id": "not-a-number", "title": "type clash"}\n'
    )
    df = (
        spark.read.schema("id bigint, title string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    good = {r["id"] for r in rows if r["_corrupt_record"] is None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert good == {1, 2}
    assert len(bad) == 2
    # and DROPMALFORMED keeps only the clean rows
    clean = (
        spark.read.schema("id bigint, title string")
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert {r["id"] for r in clean.collect()} == {1, 2}


def test_contract_validate_splits_clean_and_violations(spark):
    from rc_scanner_spark.operators.contracts import (
        in_range,
        in_set,
        matches,
        not_null,
        validate,
    )

    rows = [
        (1, "view", 10.0, "u1"),
        (None, "view", 10.0, "u2"),       # null id
        (3, "hover", 10.0, "u3"),         # bad enum
        (4, "click", -5.0, "u4"),         # out of range
        (5, "click", 9999.0, "bad user"), # out of range AND bad name
    ]
    df = spark.createDataFrame(rows, "id bigint, etype string, v double, name string")
    rules = [
        not_null("id"),
        in_set("etype", ["view", "click"]),
        in_range("v", 0.0, 100.0),
        matches("name", r"^u\d+$"),
    ]
    clean, violations = validate(df, rules)
    assert {r["id"] for r in clean.collect()} == {1}
    viol = {(r["id"], r["violated_rule"]) for r in violations.collect()}
    assert viol == {
        (None, "id_not_null"),
        (3, "etype_in_set"),
        (4, "v_in_range"),
        (5, "v_in_range"),
        (5, "name_matches"),
    }


def test_jsonl_sink_writes_atomically(spark, tmp_path):
    """The custom Python DataSource writer: committed parts only, no
    temp files left, content round-trips."""
    import json
    import os

    from rc_scanner_spark.sinks.jsonl_sink import JsonlSinkDataSource

    spark.dataSource.register(JsonlSinkDataSource)
    out = str(tmp_path / "jsonl_out")
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id bigint, name string"
    ).repartition(2)
    df.write.format("jsonlsink").option("path", out).mode("append").save()

    files = sorted(os.listdir(out))
    assert files and all(f.startswith("part-") for f in files)
    rows = []
    for f in files:
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted((r["id"], r["name"]) for r in rows) == [
        (1, "alpha"),
        (2, "beta"),
        (3, "gamma"),
    ]


def test_jsonl_stream_sink_commits_per_epoch(spark, tmp_path):
    """Streaming custom sink: every micro-batch lands in its own
    epoch=N directory, rows round-trip, no temp files remain."""
    import json
    import os

    from rc_scanner_spark.sinks.jsonl_sink import JsonlSinkDataSource

    spark.dataSource.register(JsonlSinkDataSource)
    src = str(tmp_path / "stream_src")
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(6)], "id bigint, name string"
    )
    df.repartition(3).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "stream_out")
    q = (
        spark.readStream.schema("id bigint, name string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("jsonlsink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_jsonl"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    epochs = [d for d in os.listdir(out) if d.startswith("epoch=")]
    assert len(epochs) >= 2
    assert not [f for f in os.listdir(out) if f.startswith("_tmp-")]
    rows = []
    for e in epochs:
        for f in os.listdir(os.path.join(out, e)):
            with open(os.path.join(out, e, f)) as fh:
                rows += [json.loads(line) for line in fh]
    assert sorted(r["id"] for r in rows) == list(range(6))


def test_jsonl_stream_sink_restart_no_duplication(spark, tmp_path):
    """Stop the stream, add data, restart from the same checkpoint:
    every row lands exactly once across the two runs' epochs."""
    import json
    import os

    from rc_scanner_spark.sinks.jsonl_sink import JsonlSinkDataSource

    spark.dataSource.register(JsonlSinkDataSource)
    src = str(tmp_path / "restart_src")
    out = str(tmp_path / "restart_out")
    ckpt = str(tmp_path / "restart_ckpt")

    def run_once():
        q = (
            spark.readStream.schema("id bigint, name string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("jsonlsink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string") \
        .coalesce(1).write.mode("append").parquet(src)
    run_once()
    spark.createDataFrame([(3, "c"), (4, "d")], "id bigint, name string") \
        .coalesce(1).write.mode("append").parquet(src)
    run_once()

    rows = []
    for e in os.listdir(out):
        if not e.startswith("epoch="):
            continue
        for f in os.listdir(os.path.join(out, e)):
            with open(os.path.join(out, e, f)) as fh:
                rows += [json.loads(line) for line in fh]
    assert sorted(r["id"] for r in rows) == [1, 2, 3, 4]


def test_compaction_plan_flags_fragmented_partitions(spark, tmp_path):
    """A day-partitioned write with forced fragmentation (8 files in
    one partition, 1 in the other) yields a plan that flags only the
    fragmented partition and conserves bytes/rows."""
    from pyspark.sql import functions as F

    from rc_scanner_spark.operators.maintenance import (
        compaction_plan,
        file_stats,
    )

    d = str(tmp_path / "frag")
    base = spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "2024-01-01").otherwise("2024-01-02").alias("day"),
    )
    # day=2024-01-01 written as 8 files, day=2024-01-02 as 1.
    base.filter("day = '2024-01-01'").repartition(8).write.partitionBy(
        "day"
    ).mode("overwrite").parquet(d)
    base.filter("day = '2024-01-02'").coalesce(1).write.partitionBy(
        "day"
    ).mode("append").parquet(d)
    stats = file_stats(spark, d).collect()
    assert sum(r.rows for r in stats) == 2000
    plan = {r.partition_dir.rsplit("=", 1)[-1]: r for r in compaction_plan(spark, d, target_bytes=64 * 1024 * 1024).collect()}
    assert plan["2024-01-01"].n_files == 8
    assert plan["2024-01-02"].n_files == 1
    assert plan["2024-01-01"].needs_compaction
    assert not plan["2024-01-02"].needs_compaction
    assert plan["2024-01-01"].target_files == 1
    assert plan["2024-01-01"].total_rows == 1000
