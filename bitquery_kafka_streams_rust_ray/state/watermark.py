"""Event-time watermark tracking.

The reference has no watermarks — every time-based behavior uses wall
clock (``Instant::now()``, e.g. ``src/core/utils/deduplicator.rs:59``).
The north rule upgrades this to explicit event time: the watermark is
``max(warc_ts seen so far) - allowed_lateness``, advanced once per
micro-batch epoch by the driver. It is a pure function of the epoch
composition, so replays and different cluster sizes produce the same
watermark schedule (required for deterministic window output).
"""

from __future__ import annotations

from dataclasses import dataclass, field

US = 1_000_000


@dataclass
class WatermarkTracker:
    """Monotone watermark over int64 microsecond event times."""

    allowed_lateness_us: int
    max_event_ts_us: int = field(default=-(1 << 62))

    def observe(self, max_ts_us: int) -> None:
        """Fold in the max event time of a processed epoch."""
        if max_ts_us > self.max_event_ts_us:
            self.max_event_ts_us = max_ts_us

    @property
    def watermark_us(self) -> int:
        return self.max_event_ts_us - self.allowed_lateness_us

    @property
    def drain_base_us(self) -> int:
        """Event time the finite-run drain jumps FROM — the highest
        event time any surviving row could carry."""
        return self.max_event_ts_us

    def is_late(self, ts_us: int) -> bool:
        """Rows strictly older than the watermark are late (counted +
        dropped; the ``late_dropped`` lineage counter)."""
        return ts_us < self.watermark_us

    def snapshot(self) -> dict:
        return {
            "allowed_lateness_us": self.allowed_lateness_us,
            "max_event_ts_us": self.max_event_ts_us,
        }

    @classmethod
    def restore(cls, snap: dict) -> "WatermarkTracker":
        return cls(
            allowed_lateness_us=snap["allowed_lateness_us"],
            max_event_ts_us=snap["max_event_ts_us"],
        )


@dataclass
class PartitionedWatermarkTracker:
    """Per-partition watermarks with min-combine (the Kafka/Flink
    multi-source rule): each input partition (key-shard file stream)
    tracks its own max event time, and the GLOBAL watermark is the
    minimum across partitions minus allowed lateness — a lagging or
    idle partition holds the whole pipeline's watermark back instead of
    having its rows declared late by faster partitions' progress.

    Partition maxes fold from parquet FOOTER statistics (driver-side
    metadata read at plan time — the metastore scan, no extra data
    pass), so the schedule stays a pure function of the epoch
    composition exactly like the global tracker. Same interface as
    ``WatermarkTracker``; ``observe`` (the drain path's global jump)
    raises every partition."""

    allowed_lateness_us: int
    max_per_partition: dict = field(default_factory=dict)

    @property
    def max_event_ts_us(self) -> int:
        if not self.max_per_partition:
            return -(1 << 62)
        return min(self.max_per_partition.values())

    def observe_partition(self, pid, max_ts_us: int) -> None:
        cur = self.max_per_partition.get(pid, -(1 << 62))
        if max_ts_us > cur:
            self.max_per_partition[pid] = max_ts_us

    def observe(self, max_ts_us: int) -> None:
        """Global jump (drain): no partition may stay behind."""
        if not self.max_per_partition:
            self.max_per_partition["_global"] = max_ts_us
            return
        for pid, cur in self.max_per_partition.items():
            if max_ts_us > cur:
                self.max_per_partition[pid] = max_ts_us

    @property
    def watermark_us(self) -> int:
        return self.max_event_ts_us - self.allowed_lateness_us

    @property
    def drain_base_us(self) -> int:
        """Drain jumps from the GLOBAL max across partitions: rows may
        exist up to the fastest partition's max, so jumping from the
        min-combine (which a lagging partition pins down) could leave
        windows above it unclosed."""
        if not self.max_per_partition:
            return -(1 << 62)
        return max(self.max_per_partition.values())

    def is_late(self, ts_us: int) -> bool:
        return ts_us < self.watermark_us

    def snapshot(self) -> dict:
        return {
            "allowed_lateness_us": self.allowed_lateness_us,
            "partitioned": True,
            "max_per_partition": {str(k): int(v) for k, v
                                  in sorted(self.max_per_partition.items())},
        }

    @classmethod
    def restore(cls, snap: dict) -> "PartitionedWatermarkTracker":
        return cls(
            allowed_lateness_us=snap["allowed_lateness_us"],
            max_per_partition=dict(snap["max_per_partition"].items()),
        )
