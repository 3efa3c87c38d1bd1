"""Throughput-tuned run — the ``examples/high_volume_processor.rs`` +
``examples/production_config.rs`` analog.

The reference's high-volume example turns up worker counts and batch
sizes and wraps processors with counters; its production_config example
shows the env-tuned config surface. Here the same knobs are
``EngineConfig`` fields — the comments map each to its reference
counterpart — and the counters are the engine's built-in lineage
metrics, printed at the end.

Run from the repo root: ``python examples/high_volume.py``
(optionally ``ROWS=500000 CPUS=16``)
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

if not ray.is_initialized():
    ray.init(address="local",
             num_cpus=int(os.environ.get("CPUS", "8")),
             include_dashboard=False, logging_level="ERROR")

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.pipelines.flagship import (
    ensure_pages_log,
    run_flagship,
)
from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec

rows = int(os.environ.get("ROWS", "200000"))
data_dir = f"/tmp/bitquery_kafka_streams_rust_ray_example_hv_{rows}"
ensure_pages_log(data_dir, PagesSpec(num_rows=rows))
out_dir = f"{data_dir}_out"
shutil.rmtree(out_dir, ignore_errors=True)

ncpus = int(ray.cluster_resources().get("CPU", 8))
cfg = EngineConfig(
    min_text_len=1,
    # parallel_workers analog (src/config.rs:266): keyed state actors
    state_shards=max(4, ncpus // 2),
    # worker pool size analog: html->text actor pool
    extract_concurrency=max(4, ncpus // 2),
    # batch_size analog (src/config.rs:268): bigger batches, fewer
    # per-batch fixed costs — the Arrow columnar equivalent of the
    # reference's "100-1000 events per batch" guidance
    batch_size=2048,
    read_batch_size=16384,
    # micro-batch sizing: fewer, larger epochs amortize the per-epoch
    # planning/commit tail (see BASELINE.md)
    files_per_epoch=8,
)

t0 = time.time()
summary = run_flagship(data_dir, out_dir, config=cfg, resume=False)
dt = time.time() - t0
m = summary["metrics"]["counters"]
print(f"{rows} pages in {dt:.1f}s = {rows / dt:,.0f} docs/s "
      f"on {ncpus} CPUs")
print({k: int(v) for k, v in sorted(m.items())})
ray.shutdown()
