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
