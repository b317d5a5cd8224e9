"""Streaming observability: a StreamingQueryListener that captures
per-batch progress (rows, duration, state size) for tests, ops
dashboards, and regression gates.

The reference has no metrics at all (its loop prints matches and
nothing else); a production stream needs input-rate vs process-rate to
detect falling behind, and state-rows growth to catch unbounded
state — exactly the two regressions the streaming suite guards
(bounded dedup state, watermark eviction).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchStats:
    batch_id: int
    num_input_rows: int
    process_ms: float | None
    state_rows: int | None


@dataclass
class ProgressCapture(StreamingQueryListener):
    """Collects one BatchStats per completed micro-batch.

    ``query_id``: restrict capture to one query — a session-level
    listener fires for EVERY stream on the session, so unfiltered
    totals are polluted the moment a second query (or a leftover from
    a previous test) runs."""

    batches: list[BatchStats] = field(default_factory=list)
    query_id: str | None = None

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        if self.query_id is not None and str(p.id) != str(self.query_id):
            return
        state_rows = None
        if p.stateOperators:
            state_rows = sum(op.numRowsTotal for op in p.stateOperators)
        self.batches.append(
            BatchStats(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                process_ms=p.durationMs.get("triggerExecution")
                if p.durationMs
                else None,
                state_rows=state_rows,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- summaries -------------------------------------------------------
    def total_rows(self) -> int:
        return sum(b.num_input_rows for b in self.batches)

    def max_state_rows(self) -> int:
        return max((b.state_rows or 0) for b in self.batches) if self.batches else 0
