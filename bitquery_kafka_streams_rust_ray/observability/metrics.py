"""Counters / gauges / histograms with Prometheus text export (S7/A3/A4).

Re-expresses the reference's ``MetricsRegistry``
(``src/observability/metrics.rs:164-280``) without the HTTP server: the
driver owns one registry, per-stage/per-epoch partial counts merge into
it, and the result serializes to JSON (stored next to each checkpoint
manifest) or Prometheus text format. Histogram percentiles
(p50/p90/p95/p99 + min/max/avg, ``metrics.rs:226-248``) are exact
(numpy) at driver scale — the driver only ever holds per-epoch scalars,
not per-row samples.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

# Lineage counter names used by the streaming pipeline (§7.1)
LINEAGE_COUNTERS = (
    "rows_read",
    "rows_parsed",
    "parse_errors",
    "rows_filtered_out",
    "rows_deduped",
    "late_dropped",
    "rows_joined",
    "windows_emitted",
    "rows_written",
)


class MetricsRegistry:
    """Driver-side metric registry; all operations are plain dict math."""

    def __init__(self):
        self.counters: dict[str, float] = defaultdict(float)
        self.gauges: dict[str, float] = {}
        self.histograms: dict[str, list[float]] = defaultdict(list)

    # --- recording -----------------------------------------------------
    def inc(self, name: str, value: float = 1.0) -> None:
        self.counters[name] += value

    def set_gauge(self, name: str, value: float) -> None:
        self.gauges[name] = value

    def observe(self, name: str, value: float) -> None:
        self.histograms[name].append(value)

    def merge_counts(self, counts: dict[str, float]) -> None:
        """Fold a partial counter dict (one epoch/stage) into the registry."""
        for k, v in counts.items():
            self.counters[k] += v

    # --- reading -------------------------------------------------------
    def histogram_stats(self, name: str) -> dict[str, float]:
        values = self.histograms.get(name)
        if not values:
            return {}
        arr = np.asarray(values, dtype=np.float64)
        return {
            "count": int(arr.size),
            "min": float(arr.min()),
            "max": float(arr.max()),
            "avg": float(arr.mean()),
            "p50": float(np.percentile(arr, 50)),
            "p90": float(np.percentile(arr, 90)),
            "p95": float(np.percentile(arr, 95)),
            "p99": float(np.percentile(arr, 99)),
        }

    def to_dict(self) -> dict:
        return {
            "counters": dict(self.counters),
            "gauges": dict(self.gauges),
            "histograms": {k: self.histogram_stats(k) for k in self.histograms},
        }

    def export_prometheus(self) -> str:
        """Text exposition format (metrics.rs:251-280 analog)."""
        lines: list[str] = []
        for name in sorted(self.counters):
            lines.append(f"# TYPE {name} counter")
            lines.append(f"{name} {self.counters[name]:g}")
        for name in sorted(self.gauges):
            lines.append(f"# TYPE {name} gauge")
            lines.append(f"{name} {self.gauges[name]:g}")
        for name in sorted(self.histograms):
            stats = self.histogram_stats(name)
            lines.append(f"# TYPE {name} summary")
            for q in ("p50", "p90", "p95", "p99"):
                lines.append(
                    f'{name}{{quantile="{q[1:]}"}} {stats[q]:g}'
                )
            lines.append(f"{name}_count {stats['count']}")
            lines.append(f"{name}_min {stats['min']:g}")
            lines.append(f"{name}_max {stats['max']:g}")
            lines.append(f"{name}_avg {stats['avg']:g}")
        return "\n".join(lines) + "\n"
