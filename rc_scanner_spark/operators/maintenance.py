"""Lake maintenance: small-files diagnostics and compaction planning.

A continuously-ingesting corpus (streaming foreachBatch sinks, hourly
merges) fragments into small files; scan throughput at 100 TB dies on
file-open overhead long before bytes.  This operator reads the hidden
``_metadata`` file-source columns (no filesystem listing from the
driver, no RDD walk — the executors already know their files) and
emits one row per partition directory with a merge plan.

Catalyst-native: ``_metadata.file_path`` / ``file_size`` are plain
columns; the per-partition rollup is one hash aggregation.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file stats for a parquet dataset: (file, partition dir,
    bytes, rows).  Row counts come from a groupBy on the metadata
    column — one scan, count-only (column-pruned to nothing)."""
    df = spark.read.parquet(path)
    return (
        df.select(
            F.col("_metadata.file_path").alias("file"),
            F.col("_metadata.file_size").alias("bytes"),
        )
        .groupBy("file", "bytes")
        .agg(F.count(F.lit(1)).alias("rows"))
        .select(
            F.regexp_replace(
                "file", "/[^/]+$", ""
            ).alias("partition_dir"),
            "file",
            "bytes",
            "rows",
        )
    )


def compaction_plan(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Per-partition compaction plan: current file count/bytes and the
    target file count (ceil(bytes / target_bytes), min 1).  A
    partition "needs compaction" when it holds more files than the
    target — the signal a maintenance job keys its rewrites on.

    Scale: one metadata-only aggregation; no driver-side listing.  The
    rewrite itself is ``spark.read.parquet(dir).repartition(n).write``
    per flagged partition — embarrassingly parallel across partitions.
    """
    stats = file_stats(spark, path)
    return (
        stats.groupBy("partition_dir")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").alias("total_bytes"),
            F.sum("rows").alias("total_rows"),
        )
        .select(
            "partition_dir",
            "n_files",
            "total_bytes",
            "total_rows",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("total_bytes") / F.lit(target_bytes)).cast(
                    "int"
                ),
            ).alias("target_files"),
        )
        .withColumn(
            "needs_compaction", F.col("n_files") > F.col("target_files")
        )
    )


# --- rewrite-side compaction ------------------------------------------------


def dir_bytes(path: str) -> int:
    """Total bytes of data files under ``path`` (local filesystem; on
    a cluster ask the FileSystem API instead)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_to(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    shuffle: bool = False,
) -> int:
    """Rewrite ``src_dir`` parquet into ``dst_dir`` with file count
    sized to ``target_bytes`` per file (pre-compression estimate from
    on-disk size — compressed output files land under target, never
    over by much).  Returns the number of output files."""
    df: DataFrame = spark.read.parquet(src_dir)
    n_files = max(1, math.ceil(dir_bytes(src_dir) / target_bytes))
    out = df.repartition(n_files) if shuffle else df.coalesce(n_files)
    out.write.mode("overwrite").parquet(dst_dir)
    return sum(
        1
        for f in os.listdir(dst_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
