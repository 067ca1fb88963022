"""Streaming stats heartbeat (SURVEY §2.9 ST8).

The reference's consumer prints counters every 30 s / 5 min
(`pipeline/consumer_pipeline.py:165-235`). Structured Streaming
exposes the same signals through StreamingQueryListener / progress
events; this listener accumulates per-batch rows-processed and
duration so callers can poll health without touching the query loop.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class HeartbeatListener(StreamingQueryListener):
    """Accumulates per-query progress: batches seen, input rows, and
    the last progress payload. Thread-safe (listener callbacks arrive
    on the streaming thread)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.stats: dict[str, dict] = {}

    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.stats[event.id] = {"batches": 0, "input_rows": 0, "last": None}

    def onQueryProgress(self, event) -> None:
        p = event.progress
        payload = json.loads(p.json) if hasattr(p, "json") else {}
        with self._lock:
            s = self.stats.setdefault(p.id, {"batches": 0, "input_rows": 0, "last": None})
            s["batches"] += 1
            s["input_rows"] += int(payload.get("numInputRows", 0) or 0)
            s["last"] = payload

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    def snapshot(self) -> dict[str, dict]:
        with self._lock:
            return {k: dict(v) for k, v in self.stats.items()}
