"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only state is the flag log the dedup scans
(filter_.py:90-102).  This generalizes it: an arbitrary per-key state
machine over the change stream — here, a per-user activity tracker
that maintains (n_events, n_distinct_titles, last_ts) across
micro-batches and emits one update row per key per batch.

This is the PySpark pattern for operators Structured Streaming lacks
natively (SURVEY.md §2.B streaming row): Arrow-batched per-group
pandas with a GroupState handle; state lives in the state store
(RocksDB/HDFS-backed on a cluster), checkpointed exactly like
dropDuplicates state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user string, n_events long, n_titles long, last_offset long"
STATE_SCHEMA = "n_events long, titles array<string>, last_offset long"


def _track_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_events, titles, last_offset = state.get
        titles = list(titles)
    else:
        n_events, titles, last_offset = 0, [], -1
    seen = set(titles)
    for pdf in pdfs:
        n_events += len(pdf)
        for t in pdf["title"]:
            if t not in seen:
                seen.add(t)
                titles.append(t)
        if len(pdf):
            last_offset = max(last_offset, int(pdf["offset"].max()))
    state.update((n_events, titles, last_offset))
    yield pd.DataFrame(
        {
            "user": [key[0]],
            "n_events": [n_events],
            "n_titles": [len(titles)],
            "last_offset": [last_offset],
        }
    )


def user_activity(changes: DataFrame) -> DataFrame:
    """Per-user running activity over a Change stream: one output row
    per user per micro-batch with cumulative totals."""
    from pyspark.sql import functions as F

    slim = changes.select(
        F.col("user"), F.col("title"), F.col("meta.offset").alias("offset")
    )
    return slim.groupBy("user").applyInPandasWithState(
        _track_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
