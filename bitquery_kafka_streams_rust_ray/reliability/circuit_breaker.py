"""Circuit breaker guarding repeated calls to a failing dependency.

Port of the reference's simplified breaker state machine
(``src/core/utils/circuit_breaker.rs:17-126``): consecutive failures
reaching ``threshold`` OPEN the circuit; ``is_open()`` auto-CLOSES it
once ``reset_timeout_s`` has elapsed since it opened (no distinct
half-open state, matching the reference's documented simplification,
circuit_breaker.rs:14-16); a success closes it immediately and zeroes
the failure count (circuit_breaker.rs:46-54); failures recorded while
open refresh the opened-at time so sparse checks don't close it
prematurely (circuit_breaker.rs:61-69).

:class:`HalfOpenCircuitBreaker` additionally ports the SDK variant's
three-state machine (``circuit_breaker_sdk.rs:34-440``): OPEN admits a
bounded number of trial requests after ``reset_timeout_s``
(``allow_request``, sdk.rs:216-239 / ``transition_to_half_open``
sdk.rs:379-400), HALF-OPEN closes after ``success_threshold``
consecutive successes (sdk.rs:247-261) and re-opens — with a fresh
backoff window — on any failure (sdk.rs:292-295). The per-endpoint
registry and metrics hooks of the 520-LoC SDK file are skipped; sink
I/O is the one guarded dependency here (SURVEY §2.10 mapping).

Threading: a Ray driver calls this from one thread; a plain lock keeps
it safe if a stage ever shares one via an actor.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


class CircuitOpenError(Exception):
    """Raised by :meth:`CircuitBreaker.guard` while the circuit is open."""


class CircuitBreaker:
    def __init__(self, threshold: int, reset_timeout_s: float,
                 clock: Callable[[], float] = time.monotonic):
        if threshold <= 0:
            raise ValueError("threshold must be positive")
        self.threshold = threshold
        self.reset_timeout_s = reset_timeout_s
        self._clock = clock
        self._lock = threading.Lock()
        self._failure_count = 0
        self._is_open = False
        self._opened_at: float | None = None

    @property
    def failure_count(self) -> int:
        return self._failure_count

    def record_success(self) -> None:
        """Close the circuit and reset failures (circuit_breaker.rs:46-54)."""
        with self._lock:
            self._is_open = False
            self._failure_count = 0
            self._opened_at = None

    def record_failure(self) -> None:
        """Count a failure; open at threshold (circuit_breaker.rs:60-84)."""
        with self._lock:
            if self._is_open:
                # refresh opened-at so sparse checks don't close early
                if self._opened_at is not None:
                    self._opened_at = self._clock()
                return
            self._failure_count += 1
            if self._failure_count >= self.threshold and not self._is_open:
                self._is_open = True
                self._opened_at = self._clock()

    def is_open(self) -> bool:
        """Open-state check with timeout auto-reset (circuit_breaker.rs:91-120)."""
        with self._lock:
            if not self._is_open:
                return False
            if self._opened_at is None:
                # inconsistent (open with no open time): reset, as the
                # reference does (circuit_breaker.rs:111-118)
                self._is_open = False
                self._failure_count = 0
                return False
            if self._clock() - self._opened_at >= self.reset_timeout_s:
                self._is_open = False
                self._failure_count = 0
                self._opened_at = None
                return False
            return True

    # --- convenience wrapper (engine-side addition) --------------------
    def guard(self, fn: Callable[[], T]) -> T:
        """Run ``fn`` through the breaker: raise ``CircuitOpenError``
        while open, record success/failure from the outcome."""
        if self.is_open():
            raise CircuitOpenError(
                f"circuit open; retry after {self.reset_timeout_s}s"
            )
        try:
            out = fn()
        except Exception:
            self.record_failure()
            raise
        self.record_success()
        return out


class HalfOpenCircuitBreaker:
    """Three-state breaker with a half-open probe window
    (circuit_breaker_sdk.rs:34-440, minus registry/metrics).

    CLOSED -> OPEN after ``threshold`` consecutive failures
    (sdk.rs:286-291); OPEN -> HALF-OPEN once ``reset_timeout_s`` has
    elapsed, at which point up to ``half_open_max_requests`` trial
    calls are admitted (sdk.rs:216-239); HALF-OPEN -> CLOSED after
    ``success_threshold`` successes (sdk.rs:247-261), and any failure
    while half-open re-opens immediately with a fresh backoff window
    (sdk.rs:292-295). Unlike the simple breaker above, the open state
    never closes silently — recovery always goes through a probe.
    """

    def __init__(self, threshold: int, reset_timeout_s: float,
                 success_threshold: int = 1,
                 half_open_max_requests: int = 1,
                 clock: Callable[[], float] = time.monotonic):
        # config validation mirrors sdk.rs:117-139
        if threshold <= 0:
            raise ValueError("threshold must be positive")
        if success_threshold <= 0:
            raise ValueError("success_threshold must be positive")
        if half_open_max_requests <= 0:
            raise ValueError("half_open_max_requests must be positive")
        if success_threshold > half_open_max_requests:
            # a probe slot is only recycled when the episode resolves
            # (close or re-open), so more required successes than
            # admitted probes could never close the circuit — the
            # breaker would wedge half-open refusing everything while
            # is_open() reports False
            raise ValueError(
                "success_threshold must be <= half_open_max_requests "
                "(the circuit could never close otherwise)")
        self.threshold = threshold
        self.reset_timeout_s = reset_timeout_s
        self.success_threshold = success_threshold
        self.half_open_max_requests = half_open_max_requests
        self._clock = clock
        self._lock = threading.Lock()
        self._state = "closed"
        self._failure_count = 0
        self._success_count = 0
        self._half_open_requests = 0
        self._last_change = self._clock()

    @property
    def state(self) -> str:
        with self._lock:
            return self._state

    @property
    def failure_count(self) -> int:
        return self._failure_count

    def _transition(self, state: str) -> None:
        # caller holds the lock
        self._state = state
        self._last_change = self._clock()
        if state == "half_open":
            self._half_open_requests = 0   # sdk.rs:385-386
            self._success_count = 0
        elif state == "closed":
            self._failure_count = 0        # sdk.rs:408-410
            self._success_count = 0
            self._half_open_requests = 0

    def allow_request(self) -> bool:
        """Admission check (sdk.rs:216-239): closed always admits;
        open admits nothing until the reset timeout, then flips to
        half-open; half-open admits up to the probe budget."""
        with self._lock:
            if self._state == "closed":
                return True
            if self._state == "open":
                if self._clock() - self._last_change >= self.reset_timeout_s:
                    self._transition("half_open")
                    self._half_open_requests = 1
                    return True
                return False
            # half-open: bounded probes per window. If every admitted
            # probe's outcome was never recorded (caller crashed between
            # allow and record, probe raised BaseException), the episode
            # would otherwise wedge with no escape — so an exhausted
            # budget RE-ARMS after another reset window, keeping the
            # probe rate bounded at max_requests per window forever.
            if self._half_open_requests >= self.half_open_max_requests \
                    and self._clock() - self._last_change \
                    >= self.reset_timeout_s:
                self._transition("half_open")
            if self._half_open_requests < self.half_open_max_requests:
                self._half_open_requests += 1
                return True
            return False

    def record_success(self) -> None:
        with self._lock:
            self._success_count += 1
            if self._state == "closed":
                self._failure_count = 0    # sdk.rs:255-257
            elif self._state == "half_open" \
                    and self._success_count >= self.success_threshold:
                self._transition("closed")  # sdk.rs:258-261

    def record_failure(self) -> None:
        with self._lock:
            self._failure_count += 1
            if self._state == "closed" \
                    and self._failure_count >= self.threshold:
                self._transition("open")    # sdk.rs:286-291
            elif self._state == "half_open":
                self._transition("open")    # any probe failure re-opens

    def is_open(self) -> bool:
        """True only while open and still inside the backoff window —
        ``guard``/health checks see half-open as admissible."""
        with self._lock:
            return (self._state == "open"
                    and self._clock() - self._last_change
                    < self.reset_timeout_s)

    def guard(self, fn: Callable[[], T]) -> T:
        """Run ``fn`` through the breaker (sdk.rs execute, :307-327):
        refuse while not admissible, else record the outcome."""
        if not self.allow_request():
            raise CircuitOpenError(
                f"circuit open; retry after {self.reset_timeout_s}s"
            )
        try:
            out = fn()
        except Exception:
            self.record_failure()
            raise
        self.record_success()
        return out
