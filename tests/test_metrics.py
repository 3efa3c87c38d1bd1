"""Metrics registry: counters, percentiles, Prometheus export (metrics.rs:455-521)."""

from bitquery_kafka_streams_rust_ray.observability.metrics import MetricsRegistry


def test_counters_and_merge():
    m = MetricsRegistry()
    m.inc("rows_read", 10)
    m.inc("rows_read", 5)
    m.merge_counts({"rows_read": 2, "late_dropped": 1})
    assert m.counters["rows_read"] == 17
    assert m.counters["late_dropped"] == 1


def test_histogram_percentiles():
    m = MetricsRegistry()
    for v in range(1, 101):
        m.observe("latency_ms", float(v))
    s = m.histogram_stats("latency_ms")
    assert s["count"] == 100
    assert s["min"] == 1.0 and s["max"] == 100.0
    assert abs(s["p50"] - 50.5) < 1e-9
    assert s["p99"] >= 99.0
    assert abs(s["avg"] - 50.5) < 1e-9


def test_prometheus_export_format():
    m = MetricsRegistry()
    m.inc("events_total", 3)
    m.set_gauge("lag", 150)
    m.observe("size", 1.0)
    m.observe("size", 3.0)
    text = m.export_prometheus()
    assert "# TYPE events_total counter" in text
    assert "events_total 3" in text
    assert "# TYPE lag gauge" in text
    assert 'size{quantile="50"}' in text
    assert "size_count 2" in text


def test_empty_histogram():
    assert MetricsRegistry().histogram_stats("nope") == {}
