"""Operational monitoring (SURVEY.md §2.1 R14-R16): the reference prints a
timestamp + JVM memory every 120 s from a Timer thread (BME680.java:80-87,
220-221). The Spark-native form is a StreamingQueryListener fed by the
engine's own progress events — no second thread, and the numbers are
per-query (rows/sec, batch duration, state size), not process-wide.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger(__name__)


@dataclass
class ProgressSnapshot:
    query_id: str
    batch_id: int
    num_input_rows: int
    input_rows_per_second: float
    process_rows_per_second: float


@dataclass
class StatusMonitor(StreamingQueryListener):
    """Collects per-batch progress snapshots; `snapshots` is the in-memory
    log a dashboard (or test) reads. Equivalent of DisplayStatus, driven
    by engine events instead of a timer."""

    snapshots: list[ProgressSnapshot] = field(default_factory=list)
    started: list[str] = field(default_factory=list)
    terminated: list[str] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))
        log.info("query started: %s", event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        snap = ProgressSnapshot(
            query_id=str(p.id),
            batch_id=p.batchId,
            num_input_rows=p.numInputRows,
            input_rows_per_second=p.inputRowsPerSecond or 0.0,
            process_rows_per_second=p.processedRowsPerSecond or 0.0,
        )
        self.snapshots.append(snap)
        log.info(
            "batch %d: %d rows (%.1f rows/s)",
            snap.batch_id,
            snap.num_input_rows,
            snap.process_rows_per_second,
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing-dependent
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))
        log.info("query terminated: %s", event.id)
