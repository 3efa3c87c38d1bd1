"""Structured logger + span tracing unit tests (logging.rs/tracing.rs
analog surface)."""

import io
import json

import pytest

from bitquery_kafka_streams_rust_ray.observability.logging import (
    StructuredLogger,
    null_logger,
)
from bitquery_kafka_streams_rust_ray.observability.metrics import MetricsRegistry


def make(level="debug", metrics=None):
    buf = io.StringIO()
    clock_box = {"t": 1000.0}
    log = StructuredLogger("engine", level=level, stream=buf,
                           metrics=metrics, clock=lambda: clock_box["t"])
    return log, buf, clock_box


def lines(buf):
    return [json.loads(x) for x in buf.getvalue().splitlines()]


def test_emits_one_json_object_per_line():
    log, buf, _ = make()
    log.info("epoch_committed", epoch=3, rows=42)
    log.warn("epoch_replay", epoch=4)
    recs = lines(buf)
    assert recs[0] == {"ts": 1000.0, "level": "info", "component": "engine",
                      "event": "epoch_committed", "epoch": 3, "rows": 42}
    assert recs[1]["level"] == "warn" and recs[1]["event"] == "epoch_replay"


def test_level_gate():
    log, buf, _ = make(level="warn")
    log.debug("hidden")
    log.info("hidden_too")
    log.warn("shown")
    log.error("also_shown")
    assert [r["event"] for r in lines(buf)] == ["shown", "also_shown"]


def test_span_logs_duration_and_feeds_histogram():
    m = MetricsRegistry()
    log, buf, clock = make(metrics=m)
    with log.span("epoch_exchange", epoch=1):
        clock["t"] += 2.5
    rec = lines(buf)[-1]
    assert rec["event"] == "epoch_exchange"
    assert rec["duration_ms"] == pytest.approx(2500.0)
    assert rec["epoch"] == 1
    stats = m.histogram_stats("epoch_exchange_seconds")
    assert stats["count"] == 1 and stats["max"] == pytest.approx(2.5)


def test_span_logs_error_and_reraises():
    log, buf, _ = make()
    with pytest.raises(ValueError):
        with log.span("boom"):
            raise ValueError("x")
    rec = lines(buf)[-1]
    assert rec["level"] == "error" and "ValueError" in rec["error"]


def test_child_logger_shares_stream_and_level():
    log, buf, _ = make(level="info")
    child = log.child("sink")
    child.info("commit")
    child.debug("hidden")
    recs = lines(buf)
    assert recs == [{"ts": 1000.0, "level": "info", "component": "sink",
                     "event": "commit"}]


def test_null_logger_swallows_everything():
    null_logger().error("nothing happens")
