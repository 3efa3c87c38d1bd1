"""Component health monitoring (S7 surface; §2.10 extension hook).

Re-expresses the reference's health system
(``src/observability/health.rs``): ``HealthStatus`` three-state enum
(health.rs:20-27), per-component ``ComponentHealth`` records
(health.rs:31-44), a ``HealthChecker`` interface with a criticality
flag (health.rs:81-93), and a ``HealthMonitor`` that folds component
statuses into an overall verdict — unhealthy-critical wins, degraded-
critical degrades, unhealthy-non-critical only degrades
(health.rs:318-331).

The reference's checkers watch Kafka lag / breaker state / RSS; the
engine's watch their Ray analogs: watermark progress, epoch lag vs the
plan, sink-breaker state, and StateShard actor liveness. The report is
a plain dict serialized as ``health.json`` beside each epoch manifest
(the engine's ``/health`` endpoint analog — same JSON, pull from the
output dir instead of HTTP).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


class HealthStatus:
    HEALTHY = "healthy"
    DEGRADED = "degraded"
    UNHEALTHY = "unhealthy"


@dataclass
class ComponentHealth:
    name: str
    status: str
    last_check: float = 0.0           # unix seconds (health.rs:37)
    response_time_ms: float | None = None
    details: dict = field(default_factory=dict)
    error: str | None = None

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "status": self.status,
            "last_check": self.last_check,
            "response_time_ms": self.response_time_ms,
            "details": self.details,
            "error": self.error,
        }


class HealthChecker:
    """Checker interface (health.rs:81-93). Subclass and override."""

    def name(self) -> str:
        raise NotImplementedError

    def check_health(self) -> ComponentHealth:
        raise NotImplementedError

    def is_critical(self) -> bool:
        return True


class WatermarkHealthChecker(HealthChecker):
    """Degraded when the watermark has not advanced for more than
    ``stall_epochs`` epochs (the consumer-lag staleness analog,
    health.rs:146-163): an input with event time should move the
    watermark every epoch unless the stream is empty or stuck."""

    def __init__(self, stall_epochs: int = 3):
        self.stall_epochs = stall_epochs
        self._last_wm: int | None = None
        self._stalled_for = 0

    def name(self) -> str:
        return "watermark"

    def is_critical(self) -> bool:
        return False  # an idle stream is not a broken engine

    def observe(self, watermark_us: int) -> None:
        if self._last_wm is not None and watermark_us <= self._last_wm:
            self._stalled_for += 1
        else:
            self._stalled_for = 0
        self._last_wm = watermark_us

    def check_health(self) -> ComponentHealth:
        stalled = self._stalled_for > self.stall_epochs
        return ComponentHealth(
            name=self.name(),
            status=HealthStatus.DEGRADED if stalled else HealthStatus.HEALTHY,
            last_check=time.time(),
            details={"watermark_us": self._last_wm,
                     "stalled_epochs": self._stalled_for},
            error=(f"watermark stalled for {self._stalled_for} epochs"
                   if stalled else None),
        )


class EpochLagHealthChecker:
    """Epochs committed vs planned (the Kafka consumer-lag analog,
    health.rs:146-163): more than ``lag_threshold`` uncommitted planned
    epochs degrades."""

    def __init__(self, lag_threshold: int = 4):
        self.lag_threshold = lag_threshold
        self._planned = 0
        self._committed = 0

    def name(self) -> str:
        return "epoch_lag"

    def is_critical(self) -> bool:
        return True

    def observe(self, planned: int, committed: int) -> None:
        self._planned, self._committed = planned, committed

    def check_health(self) -> ComponentHealth:
        lag = max(0, self._planned - self._committed)
        over = lag > self.lag_threshold
        return ComponentHealth(
            name=self.name(),
            status=HealthStatus.DEGRADED if over else HealthStatus.HEALTHY,
            last_check=time.time(),
            details={"planned": self._planned, "committed": self._committed,
                     "lag": lag, "threshold": self.lag_threshold},
            error=(f"epoch lag {lag} exceeds threshold {self.lag_threshold}"
                   if over else None),
        )


class BreakerHealthChecker:
    """Circuit-breaker state checker (health.rs:189-206 analog)."""

    def __init__(self, breaker, component: str = "sink_breaker"):
        self.breaker = breaker
        self.component = component

    def name(self) -> str:
        return self.component

    def is_critical(self) -> bool:
        return True

    def check_health(self) -> ComponentHealth:
        is_open = self.breaker.is_open()
        return ComponentHealth(
            name=self.name(),
            status=HealthStatus.UNHEALTHY if is_open else HealthStatus.HEALTHY,
            last_check=time.time(),
            details={"failure_count": self.breaker.failure_count,
                     "open": is_open},
            error="circuit open" if is_open else None,
        )


class ActorLivenessChecker:
    """StateShard liveness: pings every shard actor with a timeout; any
    unreachable shard is UNHEALTHY (keyed state is unavailable)."""

    def __init__(self, actors: list, timeout_s: float = 5.0):
        self.actors = actors
        self.timeout_s = timeout_s

    def name(self) -> str:
        return "state_shards"

    def is_critical(self) -> bool:
        return True

    def check_health(self) -> ComponentHealth:
        import ray

        t0 = time.time()
        alive, dead = 0, 0
        err = None
        try:
            ray.get([a.ping.remote() for a in self.actors],
                    timeout=self.timeout_s)
            alive = len(self.actors)
        except Exception as e:  # noqa: BLE001 — any failure = dead shard
            dead = len(self.actors) - alive
            err = f"shard ping failed: {e!r}"
        return ComponentHealth(
            name=self.name(),
            status=HealthStatus.HEALTHY if not dead else HealthStatus.UNHEALTHY,
            last_check=time.time(),
            response_time_ms=(time.time() - t0) * 1e3,
            details={"alive": alive, "dead": dead},
            error=err,
        )


class HealthMonitor:
    """Folds component checks into one report (health.rs:285-369)."""

    def __init__(self, version: str = "0"):
        self.checkers: list = []
        self.version = version
        self._start = time.time()

    def add_checker(self, checker) -> None:
        self.checkers.append(checker)

    def check_health(self) -> dict:
        components = {}
        overall = HealthStatus.HEALTHY
        for c in self.checkers:
            h = c.check_health()
            components[h.name] = h.to_dict()
            # precedence rules, health.rs:324-331
            if h.status == HealthStatus.UNHEALTHY and c.is_critical():
                overall = HealthStatus.UNHEALTHY
            elif (h.status == HealthStatus.DEGRADED and c.is_critical()
                  and overall == HealthStatus.HEALTHY):
                overall = HealthStatus.DEGRADED
            elif (h.status == HealthStatus.UNHEALTHY and not c.is_critical()
                  and overall == HealthStatus.HEALTHY):
                overall = HealthStatus.DEGRADED
        return {
            "status": overall,
            "version": self.version,
            "uptime_seconds": time.time() - self._start,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "components": components,
        }
