"""Q17 query statistics (declared `GET /statistics`, reference
README:333,489-490 — never implemented). The reference design is engine-side
counters; here a small thread-safe registry tracks per-query-type counts and
latencies, and the serving layer increments it around each execution.
Execution-level metrics at cluster scale come from Spark's own listener bus;
these counters are the API-surface parity piece."""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager
from typing import Any


class QueryStatistics:
    """Counts + latency accumulators per query type (knn, range, ...)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counts: dict[str, int] = {}
        self._total_secs: dict[str, float] = {}
        self._errors: dict[str, int] = {}

    @contextmanager
    def track(self, query_type: str):
        t0 = time.time()
        try:
            yield
        except Exception:
            with self._lock:
                self._errors[query_type] = self._errors.get(query_type, 0) + 1
            raise
        finally:
            dt = time.time() - t0
            with self._lock:
                self._counts[query_type] = self._counts.get(query_type, 0) + 1
                self._total_secs[query_type] = (
                    self._total_secs.get(query_type, 0.0) + dt
                )

    def snapshot(self) -> dict[str, Any]:
        """The declared statistics shape: total + per-type counters."""
        with self._lock:
            per_type = {
                f"{k}_queries": v for k, v in sorted(self._counts.items())
            }
            avg_ms = {
                k: round(1000.0 * self._total_secs[k] / self._counts[k], 3)
                for k in self._counts
            }
            return {
                "total_queries": sum(self._counts.values()),
                **per_type,
                "avg_latency_ms": avg_ms,
                "errors": dict(self._errors),
            }

    def reset(self) -> None:
        with self._lock:
            self._counts.clear()
            self._total_secs.clear()
            self._errors.clear()
