"""Scalar codecs with per-worker memoization (M8/T3 analogs).

The reference hex-encodes byte fields during extraction
(``src/consumer.rs:276, 313-327``) and keeps an LRU-cached base58 codec
(``src/core/utils/base58_cache.rs:12-103``). Our analogs: vectorized hex
over Arrow binary columns, a base58 codec with the same LRU-memoization
shape, and an LRU-cached URL canonicalizer (the per-host normalization
that a web pipeline actually hits in the hot path).

Caches live in instances that stateful stages construct once per actor
(``__init__``), so memoization is amortized across batches exactly like
the reference's per-process LRU.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable
from typing import TypeVar

import pyarrow as pa

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(_B58_ALPHABET)}

K = TypeVar("K")
V = TypeVar("V")


class LruCache(dict):
    """Tiny LRU used to memoize scalar codecs (base58_cache.rs analog)."""

    def __init__(self, max_size: int = 10_000):
        super().__init__()
        if max_size <= 0:
            max_size = 10_000  # reference NonZeroUsize fallback
        self.max_size = max_size
        self._data: OrderedDict = OrderedDict()

    def get_or(self, key: K, compute: Callable[[], V]) -> V:
        if key in self._data:
            self._data.move_to_end(key)
            return self._data[key]
        value = compute()
        self._data[key] = value
        if len(self._data) > self.max_size:
            self._data.popitem(last=False)
        return value

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key: object) -> bool:
        return key in self._data


def base58_encode(data: bytes) -> str:
    """Plain base58 (Bitcoin alphabet) encode."""
    n = int.from_bytes(data, "big")
    out = []
    while n:
        n, rem = divmod(n, 58)
        out.append(_B58_ALPHABET[rem])
    pad = 0
    for b in data:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


def base58_decode(text: str) -> bytes:
    """Plain base58 decode; raises ValueError on invalid characters."""
    n = 0
    for ch in text:
        try:
            n = n * 58 + _B58_INDEX[ch]
        except KeyError:
            raise ValueError(f"invalid base58 character: {ch!r}") from None
    body = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    pad = 0
    for ch in text:
        if ch == "1":
            pad += 1
        else:
            break
    return b"\x00" * pad + body


class Base58Codec:
    """Memoized base58 codec; one instance per actor (base58_cache.rs:12-103)."""

    def __init__(self, max_size: int = 10_000):
        self._enc = LruCache(max_size)
        self._dec = LruCache(max_size)

    def encode(self, data: bytes) -> str:
        return self._enc.get_or(data, lambda: base58_encode(data))

    def decode(self, text: str) -> bytes:
        return self._dec.get_or(text, lambda: base58_decode(text))


class UrlCanonicalizer:
    """LRU-memoized url -> (host, path) split for hot-host web data."""

    def __init__(self, max_size: int = 100_000):
        self._cache = LruCache(max_size)

    def host(self, url: str) -> str:
        return self._cache.get_or(url, lambda: self._split(url))[0]

    def split(self, url: str) -> tuple[str, str]:
        return self._cache.get_or(url, lambda: self._split(url))

    @staticmethod
    def _split(url: str) -> tuple[str, str]:
        _, sep, rest = url.partition("://")
        if not sep:
            return "", url
        host, slash, path = rest.partition("/")
        return host, slash + path


def hex_encode_column(column: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized-ish hex encode of a binary column (consumer.rs:276 analog)."""
    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    return pa.array(
        [None if v is None else v.hex() for v in column.to_pylist()],
        type=pa.string(),
    )
