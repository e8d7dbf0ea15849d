"""Engine stats: the reference's 10-second counter report
(backend/lib/engine.c:388,480-514 — queries, inserts, errors, bytes
since start) restated as a StreamingQueryListener.

Spark already measures per-batch input rows and durations; this
listener folds those progress events into the reference's cumulative
counter shape and (optionally) logs a line at the same cadence. The
query side has no stream to listen to — serving.py increments the
query counter directly.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class Counters:
    inserts: int = 0  # rows folded in (engine.c counter i)
    queries: int = 0  # point queries served (counter q)
    errors: int = 0  # failed batches / requests (counter e)
    # Spark's file source reports backlog (bytes not yet processed),
    # not bytes-read; exposing the gauge honestly beats mislabeling it
    # as the reference's cumulative bytes counter.
    backlog_bytes: int = 0
    batches: int = 0
    started_at: float = field(default_factory=time.time)

    def snapshot(self) -> dict:
        return {
            "uptime_sec": round(time.time() - self.started_at, 1),
            "inserts": self.inserts,
            "queries": self.queries,
            "errors": self.errors,
            "backlog_bytes": self.backlog_bytes,
            "batches": self.batches,
        }


class EngineStatsListener(StreamingQueryListener):
    """Accumulates streaming progress into Counters; thread-safe
    (listener callbacks arrive on Spark's listener bus thread)."""

    def __init__(self, report_every_sec: float = 10.0, log=None):
        self.counters = Counters()
        self._lock = threading.Lock()
        self._report_every = report_every_sec
        self._last_report = time.time()
        self._log = log

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        with self._lock:
            self.counters.batches += 1
            self.counters.inserts += int(p.numInputRows)
            backlog = 0
            for s in p.sources:
                m = s.metrics or {}
                backlog += int(m.get("numBytesOutstanding", 0) or 0)
            self.counters.backlog_bytes = backlog  # gauge, not cumulative
            now = time.time()
            if self._log is not None and now - self._last_report >= self._report_every:
                self._last_report = now
                self._log(self.counters.snapshot())

    def onQueryTerminated(self, event):  # noqa: N802
        if event.exception is not None:
            with self._lock:
                self.counters.errors += 1

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def count_query(self, n: int = 1) -> None:
        """Serving layer hook: one point query answered."""
        with self._lock:
            self.counters.queries += n
