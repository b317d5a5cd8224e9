"""Custom stateful streaming operator via applyInPandasWithState.

STATE-GROWTH NOTE: per-user state stores the distinct-title list with
NoTimeout — unbounded by design, mirroring the reference's
never-expiring flag log.  A production deployment bounds it by storing
64-bit title hashes instead of strings (8 bytes/entry), a cap with
spill-to-count, or a state TTL; the exact-strings form is kept here
because the tests assert exact distinct titles.

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
        mx = pdf["offset"].dropna().max() if len(pdf) else None
        if mx is not None and not pd.isna(mx):
            last_offset = max(last_offset, int(mx))
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


SPEND_OUTPUT_SCHEMA = "user_id long, total_value double, n_events long"


def _make_spend_processor():
    """Spark 4 ``StatefulProcessor`` tracking per-user cumulative spend.

    The successor API to applyInPandasWithState: named state variables
    (ValueState/ListState/MapState per key) instead of one state tuple,
    plus timers and TTL.  Functionally this mirrors ``_track_user``'s
    shape so both stateful APIs are covered.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SpendTracker(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "total_value double, n_events long"
            )

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            prior = self._agg.get()
            total, n = (prior[0], prior[1]) if prior is not None else (0.0, 0)
            for pdf in rows:
                total += float(pdf["value"].sum())
                n += len(pdf)
            self._agg.update((total, n))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "total_value": [round(total, 6)],
                    "n_events": [n],
                }
            )

        def close(self) -> None:
            pass

    return SpendTracker()


def user_spend(events: DataFrame) -> DataFrame:
    """Per-user cumulative (value sum, event count) over an events
    stream via ``transformWithStateInPandas`` — one update row per user
    per micro-batch; state checkpointed in the state store."""
    from pyspark.sql import functions as F

    slim = events.select(F.col("user_id"), F.col("value"))
    return slim.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_spend_processor(),
        outputStructType=SPEND_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def _spend_aipws(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        total, n = state.get
    else:
        total, n = 0.0, 0
    for pdf in pdfs:
        total += float(pdf["value"].sum())
        n += len(pdf)
    state.update((total, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "total_value": [round(total, 6)],
            "n_events": [n],
        }
    )


def user_spend_compat(events: DataFrame) -> DataFrame:
    """``user_spend`` semantics on ``applyInPandasWithState``: the
    same per-key cumulative (value sum, event count) state machine and
    output schema, but on the stateful API that does NOT require
    ``google.protobuf`` (transformWithStateInPandas speaks protobuf to
    the state server).  State lives in the same checkpointed state
    store, so evict/restore across micro-batches and query restarts is
    exercised identically."""
    from pyspark.sql import functions as F

    slim = events.select(F.col("user_id"), F.col("value"))
    return slim.groupBy("user_id").applyInPandasWithState(
        _spend_aipws,
        outputStructType=SPEND_OUTPUT_SCHEMA,
        stateStructType="total_value double, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_spend_any(
    events: DataFrame, checkpoint: str | None = None
) -> DataFrame:
    """Pick the stateful API by environment: the Spark 4
    ``StatefulProcessor`` path where ``google.protobuf`` is importable
    (its state server speaks protobuf), the
    ``applyInPandasWithState`` twin otherwise.  Both produce the
    SPEND_OUTPUT_SCHEMA rows with identical values, so callers and
    tests are API-agnostic.

    Pass the query's ``checkpointLocation`` as ``checkpoint`` to PIN
    the choice across restarts (ADVICE r12): the two APIs use
    incompatible state-store formats, so if the environment changes
    between restarts (protobuf appears or disappears), silently
    selecting the other API would run a different stateful operator
    against the same checkpoint — best case the restart fails deep in
    the state store.  The first run records the chosen API in
    ``<checkpoint>/_stateful_api``; a later run whose environment
    selects a different API raises immediately with the mismatch
    instead."""
    try:
        import google.protobuf  # noqa: F401

        api = "transformWithStateInPandas"
    except ImportError:
        api = "applyInPandasWithState"

    if checkpoint is not None:
        # Resolve the marker through Hadoop's FileSystem so the pin
        # lands INSIDE the real checkpoint for any scheme the query
        # can checkpoint to (file:, hdfs:, s3a:, a bare path under the
        # cluster default FS) — local open()/makedirs would silently
        # write a bogus local copy for remote schemes, defeating the
        # guard in exactly the multi-driver restart it exists for
        # (r13 review).
        spark = events.sparkSession
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(checkpoint, "_stateful_api")
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        try:
            # the marker is a tiny advisory file that external tooling
            # may rewrite without refreshing the local-FS .crc sidecar
            fs.setVerifyChecksum(False)
        except Exception:
            pass  # not every FileSystem supports the toggle
        pinned = None
        if fs.exists(hpath):
            stream = fs.open(hpath)
            try:
                pinned = (
                    jvm.org.apache.commons.io.IOUtils.toString(
                        stream, "UTF-8"
                    ).strip()
                    or None  # torn/empty marker: re-pin, don't wedge
                )
            finally:
                stream.close()
        if pinned is None:
            out = fs.create(hpath, True)
            try:
                out.write(bytearray(api, "utf-8"))
            finally:
                out.close()
        elif pinned != api:
            raise RuntimeError(
                f"checkpoint {checkpoint!r} was created with {pinned}, "
                f"but this environment selects {api}: the state-store "
                "formats are incompatible. Restore the original "
                "environment or start from a fresh checkpoint."
            )

    if api == "transformWithStateInPandas":
        return user_spend(events)
    return user_spend_compat(events)
