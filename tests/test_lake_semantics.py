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
