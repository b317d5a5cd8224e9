"""Flagged-changes log sinks.

The reference's flag log (flaglog.py:27-66) is a single pretty-printed
JSON *array* document, append = full read + list append + full
overwrite — O(n) per append, O(n^2) cumulative, and impossible to
write concurrently.  The Spark-native canonical format is append-mode
JSON-lines (each row one ``FlagLogEntry``); the array format is kept
only as an export for byte-compatibility with the reference
(flaglog.py:48 writes ``json.dumps(data, indent=4)``).

Sink gating follows LOG_LEVEL semantics (examples/config.py:4-9):
  0: console only (K1)
  1: + revid log (K2, scanner.py:221-232)
  2: + flag log, log paths NULL (K3, scanner.py:161-165)
  3: + per-date content files, log paths populated (K4,
     scanner.py:166-175, 235-249)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_flaglog(flagged: DataFrame, path: str, log_level: int = 2) -> None:
    """K3, canonical form: append JSON-lines of FlagLogEntry rows.

    Reference parity on the ``log`` struct (scanner.py:161-175): at
    LOG_LEVEL 2 both paths are NULL; at level 3 ``folder`` is the
    date partition directory and ``file`` the sanitized filename —
    always populating ``file`` (the previous behavior) broke
    byte-compatibility in both directions."""
    if log_level >= 3 and "filename" in flagged.columns:
        # a frame carrying filename but not the date projection must
        # degrade to a NULL folder, not fail analysis — derive the
        # partition from meta.dt (P4, scanner.py:155) when available
        if "date" in flagged.columns:
            date_col = F.col("date")
        elif "meta" in flagged.columns:
            date_col = F.substring(F.col("meta.dt"), 1, 10)
        else:
            date_col = F.lit(None).cast("string")
        log_struct = F.struct(
            F.concat(F.lit("changes/"), date_col).alias("folder"),
            F.col("filename").alias("file"),
        )
    else:
        log_struct = F.struct(
            F.lit(None).cast("string").alias("folder"),
            F.lit(None).cast("string").alias("file"),
        )
    entry = flagged.select(
        F.col("filter"),
        F.struct(
            *[F.col(c) for c in ("id", "type", "title", "user", "meta")]
        ).alias("change"),
        log_struct.alias("log"),
    )
    entry.write.mode("append").json(path)


def export_array(spark_read_path: str, out_file: str, spark) -> None:
    """Compatibility export: materialize the JSON-lines log as the
    reference's pretty-printed single-array document (flaglog.py:48).

    Driver-side by design — the array format is inherently
    single-writer; this is an export, not a sink.
    """
    rows = [
        json.loads(line)
        for line in spark.read.text(spark_read_path).toPandas()["value"]
    ]
    assert rows, "refusing to overwrite the log with nothing (flaglog.py:46)"
    with open(out_file, "w", encoding="utf-8") as f:
        json.dump(rows, f, indent=4)


def write_revid_log(flagged: DataFrame, path: str) -> None:
    """K2 (scanner.py:221-232): one revid per line, append-only."""
    flagged.select(
        F.col("revision.new").cast("string").alias("value")
    ).write.mode("append").text(path)


def write_content_files(flagged: DataFrame, path: str) -> None:
    """K4 (scanner.py:235-249): date-partitioned full-record files.

    The reference writes one file per event named <user>_<revid>
    under logs/changes/<date>/.  Partitioned parquet keeps the same
    date layout with scalable file counts; the sanitized filename is a
    column so per-event file naming remains recoverable.
    """
    (
        flagged.withColumn("content", F.concat_ws("\n\n", "match_message", "text"))
        .select("date", "filename", "filter", "message", "content")
        .write.mode("append")
        .partitionBy("date")
        .parquet(path)
    )


def provision(base_dir: str, log_level: int) -> dict[str, str]:
    """K5 (scanner.py:91-117): map LOG_LEVEL to sink paths.

    Spark sinks create their own directories; this only decides which
    sinks are attached, mirroring examples/config.py:4-9.
    """
    paths = {}
    if log_level >= 1:
        paths["revids"] = os.path.join(base_dir, "revids")
    if log_level >= 2:
        paths["flaglog"] = os.path.join(base_dir, "flagged_changes")
    if log_level >= 3:
        paths["changes"] = os.path.join(base_dir, "changes")
    return paths
