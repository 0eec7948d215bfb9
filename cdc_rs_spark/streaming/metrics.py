"""Streaming observability: a StreamingQueryListener that captures per-batch
progress into a queryable log.

The reference binary's only observability is an env-filtered tracing
subscriber (src/main.rs:115-121: `tracing_subscriber::fmt` + EnvFilter) —
operators read throughput off the logs. Spark's listener bus carries the
same signals structured: rows/sec per source, batch durations, and stateful
operator sizes. This module turns them into (a) an in-memory ring of recent
batches and (b) an optional JSON-lines file that survives the session — the
artifact a lag dashboard or an alert rule consumes.

Usage:
    mon = StreamMonitor(spark, path="progress.jsonl")   # attaches listener
    ... run queries ...
    mon.snapshot()      # list[dict]: one row per (query, batch)
    mon.lag_report()    # per-query totals: batches, rows, rows/sec, max state
    mon.stop()          # detach

Driver-side by design: listener events are already driver-local control
traffic (a few hundred bytes per batch), never data rows.
"""

from __future__ import annotations

import json
import threading
from collections import deque

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class _Listener(StreamingQueryListener):
    def __init__(self, monitor: "StreamMonitor"):
        self._m = monitor

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = {
            "query_id": str(p.id),
            "name": p.name,
            "batch_id": p.batchId,
            "timestamp": p.timestamp,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "process_rows_per_second": p.processedRowsPerSecond,
            "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
            "state_rows": sum(
                (s.numRowsTotal or 0) for s in (p.stateOperators or [])
            ),
            "state_bytes": sum(
                (s.memoryUsedBytes or 0) for s in (p.stateOperators or [])
            ),
        }
        self._m._record(row)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


class StreamMonitor:
    """Attach on construction; `stop()` detaches. Keeps the last
    `keep` batches in memory and appends every batch to `path` (JSON
    lines) when given."""

    def __init__(self, spark: SparkSession, path: str | None = None, keep: int = 1000):
        self._spark = spark
        self._path = path
        self._rows: deque = deque(maxlen=keep)
        self._lock = threading.Lock()
        self._listener = _Listener(self)
        spark.streams.addListener(self._listener)

    def _record(self, row: dict) -> None:
        with self._lock:
            self._rows.append(row)
            if self._path:
                with open(self._path, "a") as f:
                    f.write(json.dumps(row) + "\n")

    def snapshot(self) -> list[dict]:
        with self._lock:
            return list(self._rows)

    def lag_report(self) -> list[dict]:
        """Per-query rollup: total batches/rows, mean processing rate, and
        the high-water state size — the numbers an on-call reads first."""
        agg: dict = {}
        for r in self.snapshot():
            key = r["name"] or r["query_id"]
            a = agg.setdefault(
                key,
                {
                    "query": key,
                    "batches": 0,
                    "rows": 0,
                    "total_batch_ms": 0,
                    "max_state_rows": 0,
                },
            )
            a["batches"] += 1
            a["rows"] += r["num_input_rows"] or 0
            a["total_batch_ms"] += r["batch_duration_ms"] or 0
            a["max_state_rows"] = max(a["max_state_rows"], r["state_rows"])
        for a in agg.values():
            ms = a.pop("total_batch_ms")
            a["rows_per_second"] = round(a["rows"] / ms * 1000, 3) if ms else None
        return sorted(agg.values(), key=lambda a: a["query"])

    def stop(self) -> None:
        self._spark.streams.removeListener(self._listener)
