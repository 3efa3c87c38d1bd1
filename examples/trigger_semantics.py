"""Trigger-semantics demo: early / on-time / late-correction consumption.

The reference engine emits each window exactly once when its timer
fires; this engine exposes the full Flink-style trigger triple on the
same keyed state, all oracle-pinned and off by default:

1. **early firing** (``early_fire=True``): every epoch commit also
   writes speculative previews of still-open windows to
   ``window_early`` (epoch-tagged, monotone per window);
2. **on-time finals**: the default ``tumbling_lang``/``sliding_lang``
   emission when the watermark passes the window end;
3. **late corrections** (``update_mode=True``): rows behind the frozen
   watermark but within ``update_horizon_s`` are accepted, and
   already-emitted windows re-emit in ``window_updates`` with a bumped
   revision — ``read_windows_corrected`` folds base + max-revision
   corrections into the final consumer view.

Run from the repo root: ``python examples/trigger_semantics.py``
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.pipelines.flagship import (
    ensure_pages_log, read_windows_corrected, run_flagship)
from bitquery_kafka_streams_rust_ray.sinks.compaction import read_output_compacted
from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink
from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")

    data_dir = "/tmp/bitquery_kafka_streams_rust_ray_trigger_demo"
    # heavy very-late tail so the horizon actually accepts corrections
    ensure_pages_log(data_dir, PagesSpec(num_rows=4_000,
                                         very_late_frac=0.05, seed=7))
    out = "/tmp/bitquery_kafka_streams_rust_ray_trigger_demo_out"
    shutil.rmtree(out, ignore_errors=True)

    cfg = EngineConfig(min_text_len=1, state_shards=4,
                       extract_concurrency=2, update_mode=True,
                       update_horizon_s=60, early_fire=True)
    summary = run_flagship(data_dir, out, config=cfg, resume=False)
    c = summary["metrics"]["counters"]
    print(f"rows read={int(c['rows_read'])} "
          f"late accepted={int(c['late_accepted'])} "
          f"still late={int(c['late_dropped'])} "
          f"corrections committed={int(c.get('windows_updated', 0))}")

    sink = EpochSink(out)

    # 1. early: a window's previews grow epoch over epoch
    early = read_output_compacted(sink, "window_early").to_pandas()
    tum = early[early["kind"] == "tumbling:lang"]
    grown = (tum.groupby(["key", "window_start"])
             .filter(lambda g: g["epoch"].nunique() > 1))
    if len(grown):
        k, ws = grown.iloc[0]["key"], grown.iloc[0]["window_start"]
        trail = grown[(grown["key"] == k) & (grown["window_start"] == ws)]
        print(f"\nearly previews for ({k!r}, {ws}):")
        print(trail[["epoch", "doc_count"]].to_string(index=False))

    # 2. on-time final for the same window
    base = read_output_compacted(sink, "tumbling_lang").to_pandas()

    # 3. late corrections + the folded consumer view
    upd = read_output_compacted(sink, "window_updates").to_pandas()
    print(f"\n{len(upd)} correction rows (max revision "
          f"{int(upd['revision'].max()) if len(upd) else 0})")
    corrected = read_windows_corrected(out)
    merged = corrected.merge(base, on=["key", "window_start"],
                             suffixes=("_final", "_base"))
    changed = merged[merged["doc_count_final"] != merged["doc_count_base"]]
    print(f"{len(changed)} windows superseded by corrections:")
    if len(changed):
        print(changed[["key", "window_start", "doc_count_base",
                       "doc_count_final"]].head(5).to_string(index=False))

    ray.shutdown()


if __name__ == "__main__":
    main()
