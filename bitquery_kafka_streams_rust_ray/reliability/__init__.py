from .circuit_breaker import (CircuitBreaker, CircuitOpenError,
                              HalfOpenCircuitBreaker)
from .retry import RetryConfig, RetryExhausted, RetryStrategy

__all__ = [
    "CircuitBreaker",
    "CircuitOpenError",
    "HalfOpenCircuitBreaker",
    "RetryConfig",
    "RetryExhausted",
    "RetryStrategy",
]
