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


def test_state_size_gauges_exported(tmp_path, ray_session):
    """Per-family state-size gauges (total + hottest shard) ride the
    metrics registry: nonzero mid-stream (no drain), zero after a drain
    evicts everything."""
    from bitquery_kafka_streams_rust_ray.config import EngineConfig
    from bitquery_kafka_streams_rust_ray.pipelines.streaming import (
        StreamingPagesPipeline)
    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec, generate_host_metadata, generate_pages)

    d = str(tmp_path / "pages")
    generate_pages(d, PagesSpec(num_rows=1_000, seed=42))
    generate_host_metadata(d, PagesSpec(num_rows=1_000, seed=42))
    cfg = EngineConfig(min_text_len=1, state_shards=2,
                       extract_concurrency=2)

    pipe = StreamingPagesPipeline(d, str(tmp_path / "out1"), cfg)
    summary = pipe.run(resume=False, drain=False)
    g = summary["metrics"]["gauges"]
    assert g["state_dedup_keys"] > 0
    assert g["state_open_sessions"] > 0
    assert 0 < g["state_dedup_keys_max_shard"] <= g["state_dedup_keys"]

    pipe2 = StreamingPagesPipeline(d, str(tmp_path / "out2"), cfg)
    summary2 = pipe2.run(resume=False, drain=True)
    g2 = summary2["metrics"]["gauges"]
    # the drain watermark passes every window/session/dedup horizon
    for k in ("state_dedup_keys", "state_open_windows",
              "state_open_sessions", "state_funnel_open"):
        assert g2[k] == 0, (k, g2[k])
    # prometheus export carries them
    text = pipe2.metrics.export_prometheus()
    assert "state_dedup_keys" in text
