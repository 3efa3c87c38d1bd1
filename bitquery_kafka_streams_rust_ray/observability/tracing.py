"""Distributed tracing spans (src/observability/tracing.rs:1-467 analog).

Semantic port of the reference's OpenTelemetry-style tracer: spans with
trace/span/parent ids, tags, point-in-time events, a status lattice
(``Ok|Error|Cancelled|Timeout`` — tracing.rs:80-90), error recording
(tracing.rs:193-204), Jaeger-JSON export (tracing.rs:247-283) and a
``PerformanceMonitor`` timing helper (tracing.rs:315-345).

One deliberate upgrade over the reference: the reference mints ids with
``Uuid::new_v4`` (tracing.rs:105-106), which makes a resumed run's
spans unjoinable with the original's.  Here ids may be DERIVED — the
streaming engine seeds each epoch's trace id from
``(config fingerprint, epoch)`` and each child span id from
``(trace_id, operation)``, so a kill-and-resume re-emits the SAME ids
for a replayed epoch and the two runs' traces merge into one timeline.
Random v4-style ids remain the default for ad-hoc spans.
"""

from __future__ import annotations

import hashlib
import json
import time
import uuid
from dataclasses import dataclass, field


def now_micros() -> int:
    """Unix time in microseconds (tracing.rs:24-29)."""
    return int(time.time() * 1_000_000)


def derived_id(*parts: object, nbytes: int = 8) -> str:
    """Deterministic hex id from the given parts (sha256-truncated).

    16 hex chars (8 bytes) for span ids, 32 (16 bytes) for trace ids —
    the Jaeger wire sizes.
    """
    h = hashlib.sha256(":".join(str(p) for p in parts).encode())
    return h.hexdigest()[: nbytes * 2]


class SpanStatus:
    """Span outcome lattice (tracing.rs:80-90)."""

    OK = "ok"
    ERROR = "error"
    CANCELLED = "cancelled"
    TIMEOUT = "timeout"


@dataclass
class TraceContext:
    """Propagation context (tracing.rs:32-42)."""

    trace_id: str
    span_id: str
    parent_span_id: str | None = None
    baggage: dict[str, str] = field(default_factory=dict)


@dataclass
class SpanEvent:
    """Point-in-time occurrence inside a span (tracing.rs:68-77)."""

    name: str
    timestamp: int
    attributes: dict[str, str] = field(default_factory=dict)


@dataclass
class Span:
    """A unit of work in a trace (tracing.rs:45-65)."""

    span_id: str
    trace_id: str
    operation_name: str
    parent_span_id: str | None = None
    start_time: int = 0
    end_time: int | None = None
    tags: dict[str, str] = field(default_factory=dict)
    events: list[SpanEvent] = field(default_factory=list)
    status: str = SpanStatus.OK

    def duration_micros(self) -> int:
        """Duration so far, or final (tracing.rs:237-243)."""
        end = self.end_time if self.end_time is not None else now_micros()
        return max(0, end - self.start_time)

    def to_jaeger_json(self) -> dict:
        """Jaeger-UI span shape (tracing.rs:247-283)."""
        return {
            "traceID": self.trace_id,
            "spanID": self.span_id,
            "parentSpanID": self.parent_span_id,
            "operationName": self.operation_name,
            "startTime": self.start_time,
            "duration": self.duration_micros(),
            "status": self.status,
            "tags": [
                {"key": k, "value": v, "type": "string"}
                for k, v in sorted(self.tags.items())
            ],
            "logs": [
                {
                    "timestamp": ev.timestamp,
                    "fields": [{"key": "event", "value": ev.name}]
                    + [
                        {"key": k, "value": v}
                        for k, v in sorted(ev.attributes.items())
                    ],
                }
                for ev in self.events
            ],
        }


class ActiveSpan:
    """Mutable in-flight span (tracing.rs:155-244).

    Mutations after ``finish()`` are ignored, like the reference's
    ``finished`` guard.
    """

    def __init__(self, span: Span):
        self.span = span
        self.finished = False

    def set_tag(self, key: str, value: str) -> None:
        if not self.finished:
            self.span.tags[key] = str(value)

    def add_event(self, name: str,
                  attributes: dict[str, str] | None = None) -> None:
        if not self.finished:
            self.span.events.append(
                SpanEvent(name, now_micros(), dict(attributes or {})))

    def set_status(self, status: str) -> None:
        if not self.finished:
            self.span.status = status

    def record_error(self, error: str) -> None:
        """Mark failed + tag + error event (tracing.rs:193-204)."""
        if not self.finished:
            self.set_status(SpanStatus.ERROR)
            self.set_tag("error", "true")
            self.set_tag("error.message", error)
            self.add_event("error", {"error.message": error})

    def context(self) -> TraceContext:
        return TraceContext(
            trace_id=self.span.trace_id,
            span_id=self.span.span_id,
            parent_span_id=self.span.parent_span_id,
        )

    def finish(self, end_time: int | None = None) -> Span:
        if not self.finished:
            self.span.end_time = (end_time if end_time is not None
                                  else now_micros())
            self.finished = True
        return self.span


class Tracer:
    """Create root / child spans (tracing.rs:93-152)."""

    def __init__(self, service_name: str, version: str = "0"):
        self.service_name = service_name
        self.version = version

    def _base_tags(self) -> dict[str, str]:
        return {
            "service.name": self.service_name,
            "service.version": self.version,
        }

    def start_span(self, operation_name: str, *,
                   trace_id: str | None = None,
                   span_id: str | None = None,
                   start_time: int | None = None) -> ActiveSpan:
        """Root span. Pass ``trace_id``/``span_id`` to pin deterministic
        ids (resume-stable epoch traces); omitted ids are random."""
        tid = trace_id or uuid.uuid4().hex
        sid = span_id or uuid.uuid4().hex[:16]
        return ActiveSpan(Span(
            span_id=sid, trace_id=tid, operation_name=operation_name,
            start_time=(start_time if start_time is not None
                        else now_micros()),
            tags=self._base_tags()))

    def start_child_span(self, parent: TraceContext, operation_name: str,
                         *, span_id: str | None = None,
                         start_time: int | None = None) -> ActiveSpan:
        """Child span: inherits the trace id, parented to the caller's
        span (tracing.rs:131-152). ``span_id=None`` derives a
        deterministic id from (trace_id, operation) so a replayed epoch
        re-emits identical ids."""
        sid = span_id or derived_id(parent.trace_id, operation_name)
        return ActiveSpan(Span(
            span_id=sid, trace_id=parent.trace_id,
            operation_name=operation_name,
            parent_span_id=parent.span_id,
            start_time=(start_time if start_time is not None
                        else now_micros()),
            tags=self._base_tags()))


class PerformanceMonitor:
    """Time an operation under a span (tracing.rs:315-345)."""

    def __init__(self, service_name: str):
        self.tracer = Tracer(service_name)

    def time_operation(self, operation_name: str, fn):
        """Run ``fn`` inside a span; returns (result, duration_s).
        Errors are recorded on the span and re-raised (the reference's
        ``traced!`` macro semantics, tracing.rs:287-300)."""
        span = self.tracer.start_span(operation_name)
        t0 = time.perf_counter()
        try:
            result = fn()
        except Exception as exc:
            span.record_error(repr(exc))
            span.finish()
            raise
        span.set_status(SpanStatus.OK)
        span.finish()
        return result, time.perf_counter() - t0


def epoch_trace_spans(tracer: Tracer, config_fp: str, epoch: int,
                      marks: dict[str, tuple[float, float]],
                      tags: dict[str, str] | None = None) -> list[dict]:
    """Build one epoch's resume-stable span tree as Jaeger JSON.

    ``marks`` maps phase name -> (start_s, end_s) wall times (epoch
    driver phases: ``exchange``, ``finalize``, ``commit``).  The trace
    id derives from ``(config_fp, epoch)`` and every span id from the
    trace id + operation, so a resumed run replaying this epoch emits
    byte-identical ids — the traces of the two runs join.
    """
    trace_id = derived_id("trace", config_fp, epoch, nbytes=16)
    spans_present = {k: v for k, v in marks.items() if v is not None}
    if not spans_present:
        return []
    t0 = min(int(s * 1e6) for s, _ in spans_present.values())
    t1 = max(int(e * 1e6) for _, e in spans_present.values())
    root = tracer.start_span(
        f"epoch_{epoch}", trace_id=trace_id,
        span_id=derived_id(trace_id, "epoch"), start_time=t0)
    root.set_tag("epoch", str(epoch))
    for k, v in (tags or {}).items():
        root.set_tag(k, v)
    ctx = root.context()
    out = []
    for op in ("exchange", "finalize", "commit"):
        if op not in spans_present:
            continue
        s, e = spans_present[op]
        child = tracer.start_child_span(ctx, op,
                                        start_time=int(s * 1e6))
        out.append(child.finish(end_time=int(e * 1e6)).to_jaeger_json())
    out.insert(0, root.finish(end_time=t1).to_jaeger_json())
    return out


def write_trace_file(path: str, spans: list[dict]) -> None:
    """Serialize one trace as JSON-lines beside the epoch manifest
    (idempotent overwrite; observability sidecar, not part of 2PC)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for s in spans:
            f.write(json.dumps(s, sort_keys=True) + "\n")
    import os

    os.replace(tmp, path)


def read_trace_file(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
