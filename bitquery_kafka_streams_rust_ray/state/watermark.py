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
    raises every partition.

    Idleness (``idle_epochs > 0``): the min-combine's classic failure
    is a partition that stops producing — its frozen max pins the
    global watermark forever, windows never close, and keyed state
    grows without bound. The wall-clock idleness timeout streaming
    engines use (Flink ``withIdleness``) would break replay
    determinism here, so idleness is counted in EPOCHS: a partition
    that contributed no data for ``idle_epochs`` consecutive epochs
    (``advance_epoch``, fed from the same plan metadata as the maxes)
    is excluded from the min-combine until it produces again. A
    reappearing partition's stale rows are late by construction and
    flow through the existing late-row counters/quarantine — the same
    trade Flink makes. The emitted watermark is floored at its
    previous value, so a reappearance never regresses it. Both the
    idle counters and the floor ride the snapshot: the schedule stays
    a pure function of the epoch composition across resumes."""

    allowed_lateness_us: int
    max_per_partition: dict = field(default_factory=dict)
    idle_epochs: int = 0  # 0 = off: every partition always combines
    epochs_idle: dict = field(default_factory=dict)
    floor_us: int = field(default=-(1 << 62))  # monotone emission floor

    @property
    def max_event_ts_us(self) -> int:
        if not self.max_per_partition:
            return -(1 << 62)
        vals = self.max_per_partition
        if self.idle_epochs > 0:
            active = [v for pid, v in vals.items()
                      if self.epochs_idle.get(pid, 0) < self.idle_epochs]
            if active:  # all-idle: hold (the floor keeps the emission)
                return min(active)
        return min(vals.values())

    def observe_partition(self, pid, max_ts_us: int) -> None:
        cur = self.max_per_partition.get(pid, -(1 << 62))
        if max_ts_us > cur:
            self.max_per_partition[pid] = max_ts_us

    def advance_epoch(self, active_pids) -> None:
        """Fold one epoch's partition activity into the idle counters:
        partitions that contributed data reset, known partitions that
        did not age one epoch. Deterministic — driven by the epoch
        plan, never the wall clock."""
        active = set(active_pids)
        for pid in active:
            self.epochs_idle[pid] = 0
        for pid in self.max_per_partition:
            if pid not in active:
                self.epochs_idle[pid] = self.epochs_idle.get(pid, 0) + 1
        # the floor makes the emitted watermark monotone even when an
        # idle-excluded partition reappears with a stale max
        cur = self.max_event_ts_us - self.allowed_lateness_us
        if cur > self.floor_us:
            self.floor_us = cur

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
        return max(self.max_event_ts_us - self.allowed_lateness_us,
                   self.floor_us)

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
            "epochs_idle": {str(k): int(v) for k, v
                            in sorted(self.epochs_idle.items())},
            "floor_us": int(self.floor_us),
        }

    @classmethod
    def restore(cls, snap: dict,
                idle_epochs: int = 0) -> "PartitionedWatermarkTracker":
        return cls(
            allowed_lateness_us=snap["allowed_lateness_us"],
            max_per_partition=dict(snap["max_per_partition"].items()),
            idle_epochs=idle_epochs,
            epochs_idle=dict(snap.get("epochs_idle", {}).items()),
            floor_us=snap.get("floor_us", -(1 << 62)),
        )
