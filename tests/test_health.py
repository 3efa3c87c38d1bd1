"""Health monitor unit tests (health.rs:285-369 fold rules + checker
threshold semantics) and the end-to-end telemetry surface."""

import json
import os

import pytest

from bitquery_kafka_streams_rust_ray.observability.health import (
    BreakerHealthChecker,
    ComponentHealth,
    EpochLagHealthChecker,
    HealthChecker,
    HealthMonitor,
    HealthStatus,
    WatermarkHealthChecker,
)
from bitquery_kafka_streams_rust_ray.reliability import CircuitBreaker


class FixedChecker(HealthChecker):
    def __init__(self, name, status, critical=True):
        self._name, self._status, self._critical = name, status, critical

    def name(self):
        return self._name

    def is_critical(self):
        return self._critical

    def check_health(self):
        return ComponentHealth(name=self._name, status=self._status)


def _monitor(*checkers):
    m = HealthMonitor(version="test")
    for c in checkers:
        m.add_checker(c)
    return m


def test_report_structure():
    rep = _monitor(FixedChecker("a", HealthStatus.HEALTHY)).check_health()
    assert rep["status"] == HealthStatus.HEALTHY
    assert rep["version"] == "test"
    assert "uptime_seconds" in rep and "timestamp" in rep
    comp = rep["components"]["a"]
    assert {"name", "status", "last_check", "response_time_ms",
            "details", "error"} <= set(comp)


def test_overall_status_fold_rules():  # health.rs:324-331
    # unhealthy critical -> unhealthy
    rep = _monitor(FixedChecker("a", HealthStatus.UNHEALTHY),
                   FixedChecker("b", HealthStatus.HEALTHY)).check_health()
    assert rep["status"] == HealthStatus.UNHEALTHY
    # degraded critical -> degraded
    rep = _monitor(FixedChecker("a", HealthStatus.DEGRADED)).check_health()
    assert rep["status"] == HealthStatus.DEGRADED
    # unhealthy NON-critical only degrades
    rep = _monitor(
        FixedChecker("a", HealthStatus.UNHEALTHY, critical=False)
    ).check_health()
    assert rep["status"] == HealthStatus.DEGRADED
    # degraded non-critical does not touch overall
    rep = _monitor(
        FixedChecker("a", HealthStatus.DEGRADED, critical=False)
    ).check_health()
    assert rep["status"] == HealthStatus.HEALTHY


def test_watermark_checker_degrades_after_stall():
    c = WatermarkHealthChecker(stall_epochs=2)
    c.observe(100)
    c.observe(200)
    assert c.check_health().status == HealthStatus.HEALTHY
    for _ in range(3):  # three epochs with no progress
        c.observe(200)
    h = c.check_health()
    assert h.status == HealthStatus.DEGRADED
    assert "stalled" in h.error
    c.observe(300)  # progress clears the stall
    assert c.check_health().status == HealthStatus.HEALTHY
    assert not c.is_critical()  # idle stream degrades, never kills


def test_epoch_lag_checker_threshold():
    c = EpochLagHealthChecker(lag_threshold=2)
    c.observe(planned=10, committed=9)
    assert c.check_health().status == HealthStatus.HEALTHY
    c.observe(planned=10, committed=5)
    h = c.check_health()
    assert h.status == HealthStatus.DEGRADED
    assert h.details["lag"] == 5


def test_breaker_checker_reflects_open_circuit():
    cb = CircuitBreaker(threshold=1, reset_timeout_s=1000)
    c = BreakerHealthChecker(cb)
    assert c.check_health().status == HealthStatus.HEALTHY
    cb.record_failure()
    h = c.check_health()
    assert h.status == HealthStatus.UNHEALTHY
    assert h.details["open"] is True


@pytest.mark.usefixtures("ray_session")
def test_streaming_run_writes_health_and_metrics(pages_dir, tmp_path):
    """Every committed epoch gets a health.json + metrics.prom under
    _observability/, with quantile lines for the stage histograms."""
    from bitquery_kafka_streams_rust_ray.config import EngineConfig
    from bitquery_kafka_streams_rust_ray.functions.filters import PageFilter
    from bitquery_kafka_streams_rust_ray.pipelines.streaming import (
        StreamingPagesPipeline,
    )

    d, _, _ = pages_dir
    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    out = str(tmp_path / "obs_out")
    cfg = EngineConfig(min_text_len=1, state_shards=4, files_per_epoch=2)
    summary = StreamingPagesPipeline(
        d, out, cfg, PageFilter(min_text_len=1), meta
    ).run(resume=False)

    for e in summary["epochs"]:
        obs = os.path.join(out, "_observability", f"epoch={e:06d}")
        with open(os.path.join(obs, "health.json")) as f:
            rep = json.load(f)
        assert rep["status"] in ("healthy", "degraded", "unhealthy")
        assert set(rep["components"]) >= {"watermark", "epoch_lag",
                                          "sink_breaker", "state_shards"}
        assert rep["components"]["state_shards"]["details"]["alive"] == 4
        with open(os.path.join(obs, "metrics.prom")) as f:
            prom = f.read()
        assert "rows_read" in prom
    # by the final epoch the exchange histogram must have quantiles
    assert 'epoch_exchange_seconds{quantile="50"}' in prom
    # and the run summary exposes the same histogram stats
    hist = summary["metrics"]["histograms"]["epoch_exchange_seconds"]
    assert hist["count"] >= 1 and hist["p99"] >= hist["p50"]


def test_dataset_stats_persisted_per_epoch(tmp_path, ray_session):
    """cfg.collect_dataset_stats writes the exchange Dataset.stats()
    breakdown beside health.json for every committed epoch."""
    import os

    from bitquery_kafka_streams_rust_ray.config import EngineConfig
    from bitquery_kafka_streams_rust_ray.pipelines.flagship import (
        ensure_pages_log,
        run_flagship,
    )
    from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec

    data_dir = "/tmp/bitquery_kafka_streams_rust_ray_pages_dstats_1000"
    ensure_pages_log(data_dir, PagesSpec(num_rows=1000))
    out = str(tmp_path / "out")
    summary = run_flagship(
        data_dir, out,
        config=EngineConfig(min_text_len=1, state_shards=2,
                            collect_dataset_stats=True),
        resume=False)
    # every data epoch (the final entry is the drain commit, which has
    # no exchange and therefore no dataset to profile)
    for epoch in summary["epochs"][:-1]:
        p = os.path.join(out, "_observability", f"epoch={epoch:06d}",
                         "dataset_stats.txt")
        assert os.path.exists(p), p
        text = open(p).read()
        assert "ReadParquet" in text or "Operator" in text, text[:200]
