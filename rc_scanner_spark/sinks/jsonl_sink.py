"""Custom Python DataSource WRITER: an atomic JSONL sink.

The reference appends flag lines to a JSON file with no atomicity
(flaglog.py:64-66 — a crash mid-rewrite corrupts the log).  This sink
is the Spark-native replacement with real commit semantics: each task
writes a private temp part file and reports it in its commit message;
the driver's ``commit`` renames all parts into place only when every
task succeeded, and ``abort`` removes the orphans — so readers never
observe a partial write.

This completes the custom-connector surface: ``sources/sse.py`` is the
Python DataSource *reader*, this is the *writer*
(``df.write.format("jsonlsink").option("path", dir).save()`` after
``spark.dataSource.register(JsonlSinkDataSource)``).

Scale notes: one file per task (bounded by partition count — pair with
``coalesce``/compaction for file-count hygiene); the commit path
touches filenames only, never data.

LOCAL-FILESYSTEM COMMIT PROTOCOL: write()/commit()/abort() rename and
remove with os.* paths, which requires driver and executors to share
one filesystem (local mode, NFS).  A cluster deployment must write
temps to shared storage and rename through the Hadoop FileSystem API
(or use the built-in file sinks); this sink demonstrates the Python
DataSource writer surface, not a distributed commit service.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, temp_path: str, rows: int):
        self.temp_path = temp_path
        self.rows = rows


class JsonlWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires option 'path'")

    def write(self, rows) -> JsonlCommitMessage:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in rows:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonlCommitMessage(tmp, n)

    def commit(self, messages) -> None:
        for m in messages:
            if m is None or m.rows == 0:
                if m is not None and os.path.exists(m.temp_path):
                    os.remove(m.temp_path)
                continue
            d, b = os.path.split(m.temp_path)
            final = os.path.join(d, b.replace("_tmp-", "part-", 1))
            os.replace(m.temp_path, final)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.temp_path):
                os.remove(m.temp_path)


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming form: every epoch's parts commit under an
    ``epoch=N`` subdirectory via the same temp-rename protocol, so a
    retried epoch replaces its own directory (idempotent — the same
    recipe as streaming/corpus.py's batch_id partitions) and a crashed
    epoch leaves only removable temp files."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires option 'path'")

    def write(self, rows) -> JsonlCommitMessage:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in rows:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonlCommitMessage(tmp, n)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (Spark API)
        epoch_dir = os.path.join(self.path, f"epoch={batchId}")
        if os.path.isdir(epoch_dir):
            for old in os.listdir(epoch_dir):  # retried epoch: replace
                os.remove(os.path.join(epoch_dir, old))
        os.makedirs(epoch_dir, exist_ok=True)
        for m in messages:
            if m is None:
                continue
            if m.rows == 0:
                if os.path.exists(m.temp_path):
                    os.remove(m.temp_path)
                continue
            final = os.path.join(
                epoch_dir, os.path.basename(m.temp_path).replace("_tmp-", "part-")
            )
            os.replace(m.temp_path, final)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        for m in messages:
            if m is not None and os.path.exists(m.temp_path):
                os.remove(m.temp_path)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonlsink")`` (batch) or
    ``df.writeStream.format("jsonlsink")`` (streaming) after
    ``spark.dataSource.register(JsonlSinkDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def schema(self) -> StructType:
        return StructType([])

    def writer(self, schema: StructType, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> JsonlStreamWriter:
        return JsonlStreamWriter(self.options)
