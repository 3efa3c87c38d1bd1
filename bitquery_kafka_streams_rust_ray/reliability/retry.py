"""Retry with exponential backoff + jitter.

Re-expresses the reference's ``RetryStrategy``
(``src/core/utils/retry.rs:35-132``): an operation is attempted up to
``1 + max_retries`` times; after each failure the caller sleeps the
current delay, then the delay grows by ``multiplier`` (capped at
``max_delay_s``) plus up to 10% jitter (``retry.rs:117-128``). The one
deliberate deviation: jitter here is *deterministic* (seeded PRNG per
strategy) so a replayed run backs off identically — randomness on a
driver would break run-to-run reproducibility for no benefit in a
single-driver engine (the thundering herd the reference guards against
is many independent consumers).

Used for the epoch replay budget in the streaming driver and for sink
filesystem operations (guarded further by the circuit breaker).
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from dataclasses import dataclass
from typing import TypeVar

T = TypeVar("T")


class RetryExhausted(Exception):
    """All attempts failed (``Error::RetryExhausted``, retry.rs:107)."""

    def __init__(self, operation_name: str, last_error: BaseException,
                 attempts: int):
        super().__init__(
            f"{operation_name} (last error: {last_error!r}, "
            f"attempts: {attempts})"
        )
        self.operation_name = operation_name
        self.last_error = last_error
        self.attempts = attempts


@dataclass(frozen=True)
class RetryConfig:
    """``RetryConfig`` analog (retry.rs:9-29, defaults :20-28)."""

    max_retries: int = 3
    initial_delay_s: float = 0.1
    max_delay_s: float = 30.0
    multiplier: float = 2.0
    jitter: float = 0.1  # max added fraction of the post-growth delay

    def validate(self) -> None:
        if self.max_retries < 0:
            raise ValueError("max_retries must be >= 0")
        if self.initial_delay_s < 0 or self.max_delay_s < 0:
            raise ValueError("delays must be >= 0")
        if self.multiplier < 1.0:
            raise ValueError("multiplier must be >= 1.0")


class RetryStrategy:
    """Synchronous port of ``RetryStrategy::retry`` (retry.rs:73-132).

    ``sleep`` is injectable for tests (the reference's delay-growth test
    measures wall clock, retry.rs:237-263; collecting the injected
    sleeps asserts the same schedule without flakiness).
    """

    def __init__(
        self,
        config: RetryConfig = RetryConfig(),
        seed: int = 0,
        sleep: Callable[[float], None] = time.sleep,
        on_retry: Callable[[str, int, BaseException, float], None] | None = None,
        fatal: tuple[type[BaseException], ...] = (),
    ):
        config.validate()
        self.cfg = config
        self._rng = random.Random(seed)
        self._sleep = sleep
        self._on_retry = on_retry
        self._fatal = fatal

    def call(self, operation_name: str, fn: Callable[[], T]) -> T:
        """Run ``fn`` until it succeeds or the budget is exhausted.
        ``fatal`` exception types re-raise immediately — retrying them
        cannot succeed (e.g. a fenced run lock)."""
        cfg = self.cfg
        current_delay = cfg.initial_delay_s
        attempts = 0
        while True:
            attempts += 1
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — retry any failure
                if isinstance(e, self._fatal):
                    raise
                if attempts > cfg.max_retries:
                    raise RetryExhausted(operation_name, e, attempts) from e
                if self._on_retry is not None:
                    self._on_retry(operation_name, attempts, e, current_delay)
                self._sleep(current_delay)
                # exponential growth, cap, then <=10% jitter, re-cap
                # (retry.rs:117-128)
                current_delay = min(current_delay * cfg.multiplier,
                                    cfg.max_delay_s)
                current_delay = min(
                    current_delay * (1.0 + cfg.jitter * self._rng.random()),
                    cfg.max_delay_s,
                )
