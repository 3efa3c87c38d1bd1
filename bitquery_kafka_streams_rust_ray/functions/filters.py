"""Vectorized predicate filters (F1-F8).

Ports the semantics of the reference's ``EventFilter`` /
``FilterBuilder`` (``src/filters.rs:44-204``) and
``DexProcessor::should_process`` (``src/processors/dex_processor.rs:
179-223``) to columnar masks: every clause is optional, clauses AND
together, boundaries are inclusive (``>= min``, ``<= max``), an empty
membership list is a no-op, and a row whose relevant field is missing
while the clause is active is rejected.

The compiled filter is a pure function ``pa.Table -> pa.BooleanArray``
intended to run inside ``map_batches(batch_format="pyarrow")`` — the
Ray-Data-idiomatic version of the reference's per-event ``matches()``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _and(mask: pa.Array | None, clause: pa.Array) -> pa.Array:
    clause = pc.fill_null(clause, False)
    return clause if mask is None else pc.and_(mask, clause)


@dataclass
class PageFilter:
    """Conjunctive filter over the pages stream (EventFilter analog).

    Clause -> reference mapping:

    - ``langs``     <- ``event_types``   (filters.rs:47-52)
    - ``min_ts`` / ``max_ts`` (inclusive) <- ``min_slot``/``max_slot``
      (filters.rs:54-64)
    - ``hosts``     <- ``program_ids`` — null host rejected when active
      (filters.rs:66-81)
    - ``min_text_len`` <- ``min_amount`` — missing text rejected when
      active (filters.rs:83-109)
    - ``urls``      <- ``signatures``    (filters.rs:110-114)
    - ``custom``    <- custom closure    (filters.rs:117-121); takes the
      whole Arrow batch, returns a boolean mask
    """

    langs: Sequence[str] | None = None
    min_ts: Any | None = None           # value comparable to the ts column
    max_ts: Any | None = None
    hosts: Sequence[str] | None = None
    min_text_len: int | None = None
    urls: Sequence[str] | None = None
    custom: Callable[[pa.Table], pa.Array] | None = None

    # column bindings — reusable over any table shape
    lang_col: str = "lang"
    ts_col: str = "warc_ts"
    host_col: str = "host"
    text_col: str = "text"
    url_col: str = "url"

    def mask(self, batch: pa.Table) -> pa.ChunkedArray | pa.Array:
        """Boolean keep-mask for a batch; nulls in active clauses -> False."""
        m: pa.Array | None = None
        if self.langs:  # empty list == no-op, like filters.rs:48
            m = _and(m, pc.is_in(batch[self.lang_col], pa.array(list(self.langs))))
        if self.min_ts is not None:
            m = _and(m, pc.greater_equal(batch[self.ts_col], self.min_ts))
        if self.max_ts is not None:
            m = _and(m, pc.less_equal(batch[self.ts_col], self.max_ts))
        if self.hosts:
            m = _and(m, pc.is_in(batch[self.host_col], pa.array(list(self.hosts))))
        if self.min_text_len is not None:
            text = batch[self.text_col]
            if pa.types.is_null(text.type):  # all-null column (empty frames)
                text = text.cast(pa.string())
            length = pc.utf8_length(text)
            m = _and(m, pc.greater_equal(length, self.min_text_len))
        if self.urls:
            m = _and(m, pc.is_in(batch[self.url_col], pa.array(list(self.urls))))
        if self.custom is not None:
            m = _and(m, self.custom(batch))
        if m is None:
            m = pa.array(np.ones(batch.num_rows, dtype=bool))
        return m

    def apply(self, batch: pa.Table) -> pa.Table:
        return batch.filter(self.mask(batch))


class FilterBuilder:
    """Fluent builder (FilterBuilder analog, filters.rs:137-204)."""

    def __init__(self) -> None:
        self._f = PageFilter()

    def langs(self, langs: Sequence[str]) -> "FilterBuilder":
        self._f.langs = list(langs)
        return self

    def min_ts(self, ts: Any) -> "FilterBuilder":
        self._f.min_ts = ts
        return self

    def max_ts(self, ts: Any) -> "FilterBuilder":
        self._f.max_ts = ts
        return self

    def ts_range(self, lo: Any, hi: Any) -> "FilterBuilder":
        self._f.min_ts, self._f.max_ts = lo, hi
        return self

    def hosts(self, hosts: Sequence[str]) -> "FilterBuilder":
        self._f.hosts = list(hosts)
        return self

    def min_text_len(self, n: int) -> "FilterBuilder":
        self._f.min_text_len = n
        return self

    def urls(self, urls: Sequence[str]) -> "FilterBuilder":
        self._f.urls = list(urls)
        return self

    def custom(self, fn: Callable[[pa.Table], pa.Array]) -> "FilterBuilder":
        self._f.custom = fn
        return self

    def build(self) -> PageFilter:
        return self._f


@dataclass
class WeightedLenFilter:
    """Second-stage derived-value filter (DexProcessor.should_process analog).

    Keeps a row iff:

    - its host is in ``target_hosts`` (empty -> no-op), and
    - when ``min_weighted_len > 0``: ``weight > 0`` and
      ``weight * text_len >= min_weighted_len`` (inclusive at the
      threshold, dex_processor.rs:200-218); rows with missing weight or
      text are rejected, mirroring the missing-price reject
      (dex_processor.rs:213-218).
    """

    target_hosts: Sequence[str] = field(default_factory=tuple)
    min_weighted_len: float = 0.0
    host_col: str = "host"
    weight_col: str = "weight"
    text_col: str = "text"

    def mask(self, batch: pa.Table) -> pa.Array:
        m: pa.Array | None = None
        if self.target_hosts:
            m = _and(m, pc.is_in(batch[self.host_col], pa.array(list(self.target_hosts))))
        if self.min_weighted_len > 0.0:
            weight = batch[self.weight_col]
            length = pc.cast(pc.utf8_length(batch[self.text_col]), pa.float64())
            positive = pc.greater(weight, 0.0)
            value = pc.multiply(weight, length)
            m = _and(m, pc.and_(positive, pc.greater_equal(value, self.min_weighted_len)))
        if m is None:
            m = pa.array(np.ones(batch.num_rows, dtype=bool))
        return m

    def apply(self, batch: pa.Table) -> pa.Table:
        return batch.filter(self.mask(batch))
