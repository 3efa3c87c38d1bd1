"""HTTP observability endpoints (http_server.rs analog): status-code
semantics per handler, Prometheus exposition, and clean shutdown."""

import json
import os
import urllib.error
import urllib.request

import pytest

from bitquery_kafka_streams_rust_ray.observability.health import (
    ComponentHealth,
    HealthChecker,
    HealthMonitor,
    HealthStatus,
)
from bitquery_kafka_streams_rust_ray.observability.http_server import (
    ObservabilityServer,
)
from bitquery_kafka_streams_rust_ray.observability.metrics import (
    MetricsRegistry,
)


class _FixedChecker(HealthChecker):
    def __init__(self, name, status, critical=True):
        self._name, self._status, self._critical = name, status, critical

    def name(self):
        return self._name

    def is_critical(self):
        return self._critical

    def check_health(self):
        return ComponentHealth(name=self._name, status=self._status)


def _get(port, path):
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=5) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def _server(status):
    mon = HealthMonitor()
    mon.add_checker(_FixedChecker("c", status))
    metrics = MetricsRegistry()
    metrics.inc("rows_total", 7)
    return ObservabilityServer(mon, metrics, port=0, version="2.0")


def test_healthy_endpoints():
    with _server(HealthStatus.HEALTHY) as srv:
        code, body = _get(srv.port, "/health")
        assert code == 200 and json.loads(body)["status"] == "healthy"
        assert _get(srv.port, "/ready")[0] == 200
        assert _get(srv.port, "/live")[0] == 200
        code, body = _get(srv.port, "/metrics")
        assert code == 200 and "rows_total 7" in body
        code, body = _get(srv.port, "/version")
        assert code == 200 and json.loads(body)["version"] == "2.0"
        assert _get(srv.port, "/nope")[0] == 404


def test_degraded_still_serves():
    # http_server.rs:133 — degraded returns 200 on /health and /ready
    with _server(HealthStatus.DEGRADED) as srv:
        assert _get(srv.port, "/health")[0] == 200
        assert _get(srv.port, "/ready")[0] == 200
        assert _get(srv.port, "/live")[0] == 200


def test_unhealthy_is_503_everywhere_but_alive_logic():
    with _server(HealthStatus.UNHEALTHY) as srv:
        assert _get(srv.port, "/health")[0] == 503
        assert _get(srv.port, "/ready")[0] == 503
        assert _get(srv.port, "/live")[0] == 503


def test_stop_releases_port():
    srv = _server(HealthStatus.HEALTHY).start()
    port = srv.port
    assert _get(port, "/ready")[0] == 200
    srv.stop()
    with pytest.raises(Exception):
        _get(port, "/ready")


def test_streaming_run_serves_probes(tmp_path, ray_session):
    """cfg.http_port wires the server around run(): probe mid-run via a
    checker thread, server gone after."""
    import threading

    from bitquery_kafka_streams_rust_ray.config import EngineConfig
    from bitquery_kafka_streams_rust_ray.pipelines.flagship import (
        ensure_pages_log,
    )
    from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec

    data_dir = "/tmp/bitquery_kafka_streams_rust_ray_pages_httptest_1000"
    ensure_pages_log(data_dir, PagesSpec(num_rows=1000))
    cfg = EngineConfig(min_text_len=1, state_shards=2,
                       extract_concurrency=2, http_port=0)

    from bitquery_kafka_streams_rust_ray.pipelines.streaming import (
        StreamingPagesPipeline,
    )

    pipe = StreamingPagesPipeline(data_dir, str(tmp_path / "out"), cfg)
    seen = {}

    def probe():
        # wait for the server to exist, then hit it while run() works
        for _ in range(200):
            srv = getattr(pipe, "http_server", None)
            if srv is not None:
                try:
                    seen["ready"] = _get(srv.port, "/ready")[0]
                    seen["metrics"] = _get(srv.port, "/metrics")[0]
                    seen["port"] = srv.port
                    return
                except Exception:
                    pass
            import time
            time.sleep(0.05)

    t = threading.Thread(target=probe)
    t.start()
    pipe.run(resume=False)
    t.join(timeout=20)
    assert seen.get("ready") in (200, 503)
    assert seen.get("metrics") == 200
    with pytest.raises(Exception):
        _get(seen["port"], "/ready")  # stopped after run()


def test_state_endpoint_404_without_reader():
    srv = _server(HealthStatus.HEALTHY).start()
    try:
        code, body = _get(srv.port, "/state")
        assert code == 404 and "not enabled" in body
    finally:
        srv.stop()


def test_streaming_queryable_state(tmp_path, ray_session):
    """Interactive queries (Kafka Streams queryable-state analog): after
    a run, /state serves the LAST COMMITTED epoch's summary, /state/topk
    the committed leaderboard, and /state/window/<key> that key's
    closed windows — all exactly equal to the committed parquet/manifest
    (reads are exactly-once-consistent by construction)."""
    from bitquery_kafka_streams_rust_ray.config import EngineConfig
    from bitquery_kafka_streams_rust_ray.pipelines.flagship import ensure_pages_log
    from bitquery_kafka_streams_rust_ray.pipelines.streaming import (
        StreamingPagesPipeline)
    from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink
    from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec

    data_dir = "/tmp/bitquery_kafka_streams_rust_ray_pages_httptest_1000"
    ensure_pages_log(data_dir, PagesSpec(num_rows=1000))
    out = str(tmp_path / "qs_out")
    cfg = EngineConfig(min_text_len=1, state_shards=2,
                       extract_concurrency=2, http_port=0)
    pipe = StreamingPagesPipeline(data_dir, out, cfg)
    pipe.run(resume=False)

    # probe the reader directly (the server wraps it verbatim and is
    # probe-tested above; run() already stopped the listener)
    sink = EpochSink(out)
    last = sink.committed_epochs()[-1]
    man = sink.read_manifest(last)

    summary = pipe._queryable_state("")
    assert summary["epoch"] == last
    assert summary["watermark_us"] == man["watermark_us"]
    assert summary["counters"] == man["counters"]

    topk = pipe._queryable_state("topk")
    import pyarrow.parquet as pq
    import os
    want = pq.read_table(
        os.path.join(sink.epoch_dir(last), "topk_host.parquet")).to_pylist()
    assert topk == want and len(topk) > 0

    wkey = pipe._queryable_state("window/en")
    assert isinstance(wkey, list)
    assert all(r["key"] == "en" for r in wkey)
    assert all(isinstance(r["window_start"], int) for r in wkey)

    assert pipe._queryable_state("nope") is None

    # and end-to-end over HTTP with a fresh server wrapping the reader
    from bitquery_kafka_streams_rust_ray.observability.http_server import (
        ObservabilityServer)
    srv = ObservabilityServer(pipe.health, pipe.metrics, port=0,
                              state_reader=pipe._queryable_state).start()
    try:
        code, body = _get(srv.port, "/state")
        assert code == 200 and json.loads(body) == summary
        code, body = _get(srv.port, "/state/topk")
        assert code == 200 and json.loads(body) == topk
        code, _ = _get(srv.port, "/state/bogus")
        assert code == 404
    finally:
        srv.stop()


def test_queryable_state_updates_view(tmp_path, ray_session):
    """/state/updates serves the latest epoch's committed correction
    rows under update mode (empty list when the output is absent)."""
    from bitquery_kafka_streams_rust_ray.config import EngineConfig
    from bitquery_kafka_streams_rust_ray.pipelines.streaming import (
        StreamingPagesPipeline)
    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec, generate_host_metadata, generate_pages)

    d = str(tmp_path / "pages_updview")
    spec = PagesSpec(num_rows=1_000, very_late_frac=0.05, seed=7)
    generate_pages(d, spec)
    generate_host_metadata(d, spec)
    out = str(tmp_path / "updview_out")
    cfg = EngineConfig(min_text_len=1, state_shards=2,
                       extract_concurrency=2, update_mode=True,
                       update_horizon_s=60)
    pipe = StreamingPagesPipeline(d, out, cfg)
    pipe.run(resume=False)

    view = pipe._queryable_state("updates")
    assert isinstance(view, list)
    for r in view:
        assert r["revision"] >= 1
        assert isinstance(r["window_start"], int)

    # no update mode -> the output file is absent, view degrades to []
    out2 = str(tmp_path / "updview_out2")
    pipe2 = StreamingPagesPipeline(
        d, out2, EngineConfig(min_text_len=1, state_shards=2,
                              extract_concurrency=2))
    pipe2.run(resume=False)
    assert pipe2._queryable_state("updates") == []


def test_queryable_state_watermark_view(tmp_path, ray_session):
    """/state/watermark explains the min-combine: per-partition maxes,
    idle counters, the monotone floor, and the configured threshold."""
    import glob

    from bitquery_kafka_streams_rust_ray.config import EngineConfig
    from bitquery_kafka_streams_rust_ray.pipelines.streaming import (
        StreamingPagesPipeline)
    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec, generate_host_metadata, generate_pages)

    d = str(tmp_path / "pages_wmview")
    spec = PagesSpec(num_rows=1_500, num_slices=4, shards=3, seed=5)
    generate_pages(d, spec)
    generate_host_metadata(d, spec)
    # kill shard stream 2 after slice 0 so idle counters show up
    for f in glob.glob(os.path.join(d, "pages-*-02.parquet")):
        if int(os.path.basename(f).split("-")[1]) >= 1:
            os.remove(f)
    out = str(tmp_path / "wmview_out")
    cfg = EngineConfig(min_text_len=1, state_shards=2,
                       extract_concurrency=2, files_per_epoch=1,
                       per_partition_watermark=True,
                       watermark_idle_epochs=2)
    pipe = StreamingPagesPipeline(d, out, cfg)
    pipe.run(resume=False)

    view = pipe._queryable_state("watermark")
    assert isinstance(view["watermark_us"], int)
    assert set(view["partitions"]) == {"00", "01", "02"}
    assert view["epochs_idle"]["02"] >= 2  # excluded by the drain epoch
    assert view["epochs_idle"]["00"] == 0
    assert view["idle_epochs_threshold"] == 2
    assert isinstance(view["floor_us"], int)

    # global-tracker run: view degrades to the committed watermark only
    out2 = str(tmp_path / "wmview_out2")
    pipe2 = StreamingPagesPipeline(
        d, out2, EngineConfig(min_text_len=1, state_shards=2,
                              extract_concurrency=2))
    pipe2.run(resume=False)
    v2 = pipe2._queryable_state("watermark")
    assert "partitions" not in v2 and isinstance(v2["watermark_us"], int)


def test_queryable_state_cep_and_session_views(tmp_path, ray_session):
    """/state/session_updates and /state/funnel_timeouts serve the
    latest epoch's committed changelog/abandoned-funnel rows (empty
    list when the output is absent)."""
    from bitquery_kafka_streams_rust_ray.config import EngineConfig, FunnelConfig
    from bitquery_kafka_streams_rust_ray.pipelines.streaming import (
        StreamingPagesPipeline)
    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec, generate_host_metadata, generate_pages)

    d = str(tmp_path / "pages_cepview")
    spec = PagesSpec(num_rows=1_000, very_late_frac=0.05, seed=11)
    generate_pages(d, spec)
    generate_host_metadata(d, spec)
    out = str(tmp_path / "cepview_out")
    cfg = EngineConfig(min_text_len=1, state_shards=2,
                       extract_concurrency=2, update_mode=True,
                       update_horizon_s=180,
                       funnel=FunnelConfig(veto_min_len=470,
                                           emit_timeouts=True))
    pipe = StreamingPagesPipeline(d, out, cfg)
    pipe.run(resume=False)

    sview = pipe._queryable_state("session_updates")
    assert isinstance(sview, list)
    for r in sview:
        assert r["action"] in ("retract", "add")
        assert isinstance(r["session_start"], int)
    fview = pipe._queryable_state("funnel_timeouts")
    assert isinstance(fview, list)
    for r in fview:
        assert 1 <= r["reached_stage"] <= cfg.funnel.n_stages
        assert isinstance(r["start_ts"], int)

    # neither feature on -> both views degrade to []
    out2 = str(tmp_path / "cepview_out2")
    pipe2 = StreamingPagesPipeline(
        d, out2, EngineConfig(min_text_len=1, state_shards=2,
                              extract_concurrency=2))
    pipe2.run(resume=False)
    assert pipe2._queryable_state("session_updates") == []
    assert pipe2._queryable_state("funnel_timeouts") == []
