"""Retry + circuit breaker unit tests.

Ports the reference's suites: ``src/core/utils/retry.rs:164-263`` (four
retry tests) and ``src/core/utils/circuit_breaker.rs:128-219`` (five
transition tests). Time is injected (fake sleep / fake clock) so the
delay-growth and timeout-reset assertions are exact, not wall-clock
flaky.
"""

import pytest

from bitquery_kafka_streams_rust_ray.reliability import (
    CircuitBreaker,
    CircuitOpenError,
    RetryConfig,
    RetryExhausted,
    RetryStrategy,
)


# --- retry (retry.rs tests) ---------------------------------------------


def _strategy(sleeps, **cfg):
    return RetryStrategy(RetryConfig(**cfg), seed=0, sleep=sleeps.append)


def test_retry_succeeds_on_first_attempt():  # retry.rs:165-182
    sleeps, calls = [], []

    def op():
        calls.append(1)
        return "success"

    out = _strategy(sleeps).call("first_try", op)
    assert out == "success"
    assert len(calls) == 1
    assert sleeps == []


def test_retry_succeeds_after_failures():  # retry.rs:184-208
    sleeps, calls = [], []

    def op():
        calls.append(1)
        if len(calls) < 3:
            raise ValueError(f"fail attempt {len(calls)}")
        return "success finally"

    out = _strategy(sleeps, max_retries=3, initial_delay_s=0.01).call(
        "eventually", op
    )
    assert out == "success finally"
    assert len(calls) == 3
    assert len(sleeps) == 2


def test_retry_exhausts_attempts():  # retry.rs:210-235
    sleeps, calls = [], []

    def op():
        calls.append(1)
        raise ValueError("persistent failure")

    with pytest.raises(RetryExhausted) as exc_info:
        _strategy(sleeps, max_retries=2, initial_delay_s=0.01).call(
            "exhaust", op
        )
    # max_retries + 1 total attempts (retry.rs:234)
    assert len(calls) == 3
    assert "persistent failure" in str(exc_info.value)
    assert isinstance(exc_info.value.last_error, ValueError)
    assert exc_info.value.attempts == 3


def test_retry_delay_increases():  # retry.rs:237-263
    sleeps = []

    def op():
        raise ValueError("fail")

    with pytest.raises(RetryExhausted):
        _strategy(sleeps, max_retries=2, initial_delay_s=0.02,
                  max_delay_s=0.1, multiplier=2.0).call("delays", op)
    # first sleep is exactly the initial delay; the second grew by the
    # multiplier plus at most 10% jitter
    assert len(sleeps) == 2
    assert sleeps[0] == pytest.approx(0.02)
    assert 0.04 <= sleeps[1] <= 0.04 * 1.1 + 1e-9


def test_retry_delay_caps_at_max():
    sleeps = []
    with pytest.raises(RetryExhausted):
        _strategy(sleeps, max_retries=4, initial_delay_s=0.05,
                  max_delay_s=0.08, multiplier=10.0).call(
            "cap", lambda: (_ for _ in ()).throw(ValueError("x"))
        )
    assert sleeps[0] == pytest.approx(0.05)
    assert all(s <= 0.08 + 1e-9 for s in sleeps[1:])


def test_retry_jitter_is_deterministic():
    """Engine deviation from the reference (documented in retry.py):
    same seed -> same backoff schedule, for replay reproducibility."""
    def fail():
        raise ValueError("x")

    schedules = []
    for _ in range(2):
        sleeps = []
        with pytest.raises(RetryExhausted):
            RetryStrategy(
                RetryConfig(max_retries=3, initial_delay_s=0.01),
                seed=42, sleep=sleeps.append,
            ).call("det", fail)
        schedules.append(sleeps)
    assert schedules[0] == schedules[1]


def test_retry_on_retry_hook_runs_before_sleep():
    order = []

    def op():
        order.append("call")
        raise ValueError("x")

    with pytest.raises(RetryExhausted):
        RetryStrategy(
            RetryConfig(max_retries=1, initial_delay_s=0.01),
            sleep=lambda s: order.append("sleep"),
            on_retry=lambda *a: order.append("hook"),
        ).call("hook_order", op)
    assert order == ["call", "hook", "sleep", "call"]


# --- circuit breaker (circuit_breaker.rs tests) -------------------------


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance(self, dt):
        self.t += dt


def test_breaker_opens_after_threshold():  # circuit_breaker.rs:133-149
    cb = CircuitBreaker(threshold=3, reset_timeout_s=100, clock=FakeClock())
    assert not cb.is_open()
    cb.record_failure()
    assert not cb.is_open()
    cb.record_failure()
    assert not cb.is_open()
    cb.record_failure()
    assert cb.is_open()


def test_breaker_resets_after_timeout():  # circuit_breaker.rs:151-163
    clock = FakeClock()
    cb = CircuitBreaker(threshold=1, reset_timeout_s=50, clock=clock)
    cb.record_failure()
    assert cb.is_open()
    clock.advance(60)
    assert not cb.is_open()
    assert cb.failure_count == 0


def test_breaker_success_resets_failures():  # circuit_breaker.rs:165-186
    cb = CircuitBreaker(threshold=3, reset_timeout_s=100, clock=FakeClock())
    cb.record_failure()
    cb.record_failure()
    assert not cb.is_open()
    assert cb.failure_count == 2
    cb.record_success()
    assert not cb.is_open()
    assert cb.failure_count == 0
    cb.record_failure()
    cb.record_failure()
    assert not cb.is_open()
    cb.record_failure()
    assert cb.is_open()


def test_breaker_stays_open_during_timeout():  # circuit_breaker.rs:188-204
    clock = FakeClock()
    cb = CircuitBreaker(threshold=1, reset_timeout_s=100, clock=clock)
    cb.record_failure()
    assert cb.is_open()
    clock.advance(50)
    assert cb.is_open()
    # a failure while open refreshes opened-at (rs:61-69): the window
    # restarts from now
    cb.record_failure()
    clock.advance(60)
    assert cb.is_open()  # 60 < 100 since the refresh
    clock.advance(50)
    assert not cb.is_open()


def test_breaker_success_closes_open_breaker():  # circuit_breaker.rs:206-218
    cb = CircuitBreaker(threshold=1, reset_timeout_s=1000, clock=FakeClock())
    cb.record_failure()
    assert cb.is_open()
    cb.record_success()
    assert not cb.is_open()
    assert cb.failure_count == 0


def test_breaker_guard_wraps_calls():
    clock = FakeClock()
    cb = CircuitBreaker(threshold=2, reset_timeout_s=10, clock=clock)
    assert cb.guard(lambda: "ok") == "ok"
    for _ in range(2):
        with pytest.raises(ValueError):
            cb.guard(lambda: (_ for _ in ()).throw(ValueError("io")))
    with pytest.raises(CircuitOpenError):
        cb.guard(lambda: "never runs")
    clock.advance(20)
    assert cb.guard(lambda: "recovered") == "recovered"


# --- half-open breaker (circuit_breaker_sdk.rs transitions) --------------


def _ho(**kw):
    clock = FakeClock()
    from bitquery_kafka_streams_rust_ray.reliability import HalfOpenCircuitBreaker
    kw.setdefault("threshold", 3)
    kw.setdefault("reset_timeout_s", 10.0)
    return HalfOpenCircuitBreaker(clock=clock, **kw), clock


def test_half_open_full_recovery_cycle():
    """closed -> open -> half-open -> closed (sdk.rs:216-261)."""
    cb, clock = _ho()
    for _ in range(3):
        cb.record_failure()
    assert cb.state == "open" and cb.is_open()
    assert not cb.allow_request()  # still inside the backoff window

    clock.advance(10)
    assert not cb.is_open()        # timeout elapsed: probe is admissible
    assert cb.allow_request()      # flips to half-open, admits ONE probe
    assert cb.state == "half_open"
    assert not cb.allow_request()  # probe budget (1) exhausted

    cb.record_success()            # success_threshold=1 closes
    assert cb.state == "closed"
    assert cb.allow_request() and cb.failure_count == 0


def test_half_open_probe_failure_reopens_with_fresh_backoff():
    """Any failure while half-open re-opens immediately and restarts
    the backoff window (sdk.rs:292-295)."""
    cb, clock = _ho()
    for _ in range(3):
        cb.record_failure()
    clock.advance(10)
    assert cb.allow_request()      # half-open probe admitted
    cb.record_failure()            # probe failed
    assert cb.state == "open"
    clock.advance(9.5)             # fresh window: not yet probe-able
    assert not cb.allow_request()
    clock.advance(0.5)
    assert cb.allow_request()      # next window: probe again
    cb.record_success()
    assert cb.state == "closed"


def test_half_open_success_threshold_needs_n_probes():
    """Closing from half-open takes success_threshold successes
    (sdk.rs:51-52, 247-261)."""
    cb, clock = _ho(success_threshold=2, half_open_max_requests=2)
    for _ in range(3):
        cb.record_failure()
    clock.advance(10)
    assert cb.allow_request() and cb.allow_request()
    assert not cb.allow_request()  # budget of 2 exhausted
    cb.record_success()
    assert cb.state == "half_open"  # one success is not enough
    cb.record_success()
    assert cb.state == "closed"


def test_half_open_guard_drives_the_machine():
    """guard() refuses while open, probes after the window, closes on
    probe success (sdk.rs execute, :307-327)."""
    cb, clock = _ho(threshold=2, reset_timeout_s=30.0)
    for _ in range(2):
        with pytest.raises(ValueError):
            cb.guard(lambda: (_ for _ in ()).throw(ValueError("io")))
    with pytest.raises(CircuitOpenError):
        cb.guard(lambda: "refused")
    clock.advance(30)
    assert cb.guard(lambda: "probe ok") == "probe ok"
    assert cb.state == "closed"


def test_half_open_closed_success_resets_failures():
    """A success in closed state zeroes the failure streak
    (sdk.rs:255-257) — failures must be consecutive to open."""
    cb, _ = _ho()
    cb.record_failure()
    cb.record_failure()
    cb.record_success()
    assert cb.failure_count == 0
    cb.record_failure()
    cb.record_failure()
    assert cb.state == "closed"
    cb.record_failure()
    assert cb.state == "open"


def test_half_open_config_validation():
    """sdk.rs:117-139 config validation."""
    from bitquery_kafka_streams_rust_ray.reliability import HalfOpenCircuitBreaker
    with pytest.raises(ValueError):
        HalfOpenCircuitBreaker(threshold=0, reset_timeout_s=1)
    with pytest.raises(ValueError):
        HalfOpenCircuitBreaker(threshold=1, reset_timeout_s=1,
                               success_threshold=0)
    with pytest.raises(ValueError):
        HalfOpenCircuitBreaker(threshold=1, reset_timeout_s=1,
                               half_open_max_requests=0)


def test_half_open_rejects_unclosable_config():
    """success_threshold > half_open_max_requests could never close the
    circuit (probe slots only recycle when the episode resolves) — the
    config is refused up front instead of wedging at runtime."""
    from bitquery_kafka_streams_rust_ray.reliability import HalfOpenCircuitBreaker
    with pytest.raises(ValueError, match="never close"):
        HalfOpenCircuitBreaker(threshold=1, reset_timeout_s=1,
                               success_threshold=2,
                               half_open_max_requests=1)


def test_half_open_rearm_after_unrecorded_probe():
    """A probe whose outcome is never recorded (caller died between
    allow and record) must not wedge the breaker: after another reset
    window the probe budget re-arms, keeping the rate bounded at
    max_requests per window."""
    cb, clock = _ho(threshold=1, reset_timeout_s=10.0)
    cb.record_failure()
    clock.advance(10)
    assert cb.allow_request()     # probe admitted... outcome never recorded
    assert not cb.allow_request()  # budget exhausted within the window
    clock.advance(9.5)
    assert not cb.allow_request()  # still inside the window: bounded rate
    clock.advance(0.5)
    assert cb.allow_request()      # re-armed: escape exists
    cb.record_success()
    assert cb.state == "closed"
