"""Structured logging + span tracing (logging.rs / tracing.rs analogs).

The reference initializes a JSON-or-pretty tracing subscriber with
per-component levels and span timing (``src/observability/logging.rs``,
``tracing.rs``). The engine's analog:

- :class:`StructuredLogger` emits one JSON object per line —
  ``{"ts": ..., "level": ..., "component": ..., "event": ...,
  **fields}`` — to any stream, with a minimum-level gate. JSON lines
  because the consumer is a log pipeline, not a terminal (the
  reference's ``json`` format mode).
- :func:`StructuredLogger.span` is a context manager that logs span
  close with ``duration_ms`` and optionally feeds a
  ``MetricsRegistry`` histogram of the same name (tracing.rs span
  timing -> the A4 percentile surface).

The driver owns one logger; stages stay print-free (worker stdout is
interleaved garbage by construction — per-task context belongs in
lineage counters, not log lines).
"""

from __future__ import annotations

import json
import sys
import time
from contextlib import contextmanager

LEVELS = {"debug": 10, "info": 20, "warn": 30, "error": 40}


class StructuredLogger:
    def __init__(self, component: str, level: str = "info", stream=None,
                 metrics=None, clock=time.time):
        if level not in LEVELS:
            raise ValueError(f"unknown level {level!r}")
        self.component = component
        self.level = level
        self.stream = stream if stream is not None else sys.stderr
        self.metrics = metrics
        self._clock = clock

    def child(self, component: str) -> StructuredLogger:
        """Sub-component logger sharing stream/level/metrics."""
        return StructuredLogger(component, self.level, self.stream,
                                self.metrics, self._clock)

    def _emit(self, level: str, event: str, fields: dict) -> None:
        if LEVELS[level] < LEVELS[self.level]:
            return
        rec = {"ts": self._clock(), "level": level,
               "component": self.component, "event": event}
        rec.update(fields)
        self.stream.write(json.dumps(rec, sort_keys=True,
                                     default=str) + "\n")

    def debug(self, event: str, **fields) -> None:
        self._emit("debug", event, fields)

    def info(self, event: str, **fields) -> None:
        self._emit("info", event, fields)

    def warn(self, event: str, **fields) -> None:
        self._emit("warn", event, fields)

    def error(self, event: str, **fields) -> None:
        self._emit("error", event, fields)

    @contextmanager
    def span(self, name: str, level: str = "debug", **fields):
        """Timed span: logs ``<name>`` with ``duration_ms`` on exit
        (error + re-raise on exception) and records the duration into
        the metrics histogram ``<name>_seconds`` when a registry is
        attached."""
        t0 = self._clock()
        try:
            yield
        except Exception as e:
            self._emit("error", name, {**fields, "error": repr(e),
                                       "duration_ms": (self._clock() - t0) * 1e3})
            raise
        dt = self._clock() - t0
        self._emit(level, name, {**fields, "duration_ms": dt * 1e3})
        if self.metrics is not None:
            self.metrics.observe(f"{name}_seconds", dt)


def null_logger() -> StructuredLogger:
    """Disabled logger (level above every emit)."""
    out = StructuredLogger("null", "error", stream=_DevNull())
    return out


class _DevNull:
    def write(self, _s: str) -> None:
        pass
