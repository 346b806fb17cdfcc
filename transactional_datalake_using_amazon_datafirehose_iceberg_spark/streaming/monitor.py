"""Delivery logging (S10) — the CloudWatch delivery-log analogue.

Reference: Firehose writes per-stream delivery logs
(cdk_stacks/firehose_to_iceberg.py:91-95,104-108). Spark's equivalent
observability hook is a StreamingQueryListener; this one appends one
JSON line per micro-batch progress event (rows/sec, batch duration,
sink description) to a log file — queryable later as a JSONL table.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql.streaming import StreamingQueryListener


class DeliveryLogListener(StreamingQueryListener):
    """Append-only JSONL delivery log, one record per progress event."""

    def __init__(self, log_path: str):
        self.log_path = log_path
        os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
        self._lock = threading.Lock()

    @staticmethod
    def _finite(v):
        """Non-finite rates -> None: Spark reports NaN rows/sec on every
        query's FIRST progress event (no previous trigger) and json.dumps
        would emit a bare NaN token — not RFC JSON, rejected by strict
        JSONL readers incl. DuckDB read_json (review round 11)."""
        import math

        return None if isinstance(v, float) and not math.isfinite(v) else v

    def _write(self, record: dict) -> None:
        record = {k: self._finite(v) for k, v in record.items()}
        with self._lock:
            with open(self.log_path, "a") as f:
                f.write(json.dumps(record, allow_nan=False) + "\n")

    def onQueryStarted(self, event) -> None:
        # runId distinguishes checkpoint RESTARTS of the same query (id
        # is stable across restarts; id-filtered consumers would
        # double-count replayed batches without it — review round 11)
        self._write({
            "event": "started", "id": str(event.id),
            "runId": str(event.runId), "name": event.name,
        })

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "event": "progress",
                "id": str(p.id),
                "runId": str(p.runId),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
                "sink": str(p.sink.description) if p.sink else None,
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._write(
            {
                "event": "terminated",
                "id": str(event.id),
                "runId": str(event.runId),
                "exception": event.exception,
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing dependent
        pass
