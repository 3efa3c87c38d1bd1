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

The 520-LoC SDK variant (``circuit_breaker_sdk.rs``) adds per-endpoint
registries and metrics hooks the engine doesn't need — sink I/O is the
one guarded dependency here (SURVEY §2.10 mapping).

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
