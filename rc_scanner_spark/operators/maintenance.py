"""Table maintenance: small-file compaction.

Streaming sinks and fine-grained partition writes leave many small
parquet files; at 100 TB the resulting footer/open overhead dominates
scan time (every file costs a NameNode/S3 round-trip + footer parse).
Compaction rewrites a directory into files near a target size.

``coalesce`` (not ``repartition``) keeps the rewrite shuffle-free:
each output task concatenates whole input partitions.  Use
``repartition`` only when the input is skewed enough that merged
partitions would exceed executor memory — that trade is the caller's
via ``shuffle=True``.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


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
