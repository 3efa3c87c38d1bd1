from .circuit_breaker import CircuitBreaker, CircuitOpenError
from .retry import RetryConfig, RetryExhausted, RetryStrategy

__all__ = [
    "CircuitBreaker",
    "CircuitOpenError",
    "RetryConfig",
    "RetryExhausted",
    "RetryStrategy",
]
