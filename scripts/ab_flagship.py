"""Flagship A/B harness: one fresh-process run with config overrides.

Usage: python scripts/ab_flagship.py <num_cpus> [on|off]
  on/off toggles EngineConfig.overlap_commit (default on).
Env knobs: GRAFT_PAGES_ROWS (input size, default 2M, cached log);
AB_READ_NUM_BLOCKS / AB_READ_BATCH_SIZE / AB_BATCH_SIZE override the
bench physical sizing ("none" -> None). Prints one RESULT line. Pin
with `taskset -c 0-<n-1>` for quiet-window comparisons (the scaling
protocol in bench.py --scaling does this for you; this script is for
one-off parameter A/Bs like the round-4 overlap_commit measurement).
"""
import dataclasses
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

n = int(sys.argv[1])
overlap = (sys.argv[2] if len(sys.argv) > 2 else "on") == "on"
os.environ.setdefault("GRAFT_PAGES_ROWS", "2000000")
ray.init(address="local", num_cpus=n, include_dashboard=False,
         logging_level="ERROR")
import bench

data_dir = bench.ensure_bench_pages()
import ray.data as rd

for name in sorted(os.listdir(data_dir)):
    if name.endswith(".parquet"):
        open(os.path.join(data_dir, name), "rb").read()
rd.range(n * 4, override_num_blocks=n * 4).map_batches(lambda b: b).materialize()
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship

over = {"overlap_commit": overlap}
for k in ("read_num_blocks", "read_batch_size", "batch_size"):
    v = os.environ.get("AB_" + k.upper())
    if v:
        over[k] = None if v == "none" else int(v)
cfg = dataclasses.replace(bench.bench_config(n), **over)
out_dir = f"{data_dir}_ab_{n}_{overlap}"
shutil.rmtree(out_dir, ignore_errors=True)
t0 = time.time()
s = run_flagship(data_dir, out_dir, config=cfg, resume=False)
dt = time.time() - t0
r = s["metrics"]["counters"].get("rows_read", 0)
shutil.rmtree(out_dir, ignore_errors=True)
print(f"RESULT cpus={n} overlap={overlap} sec={dt:.2f} "
      f"docs_per_sec={r / dt:.0f}")
ray.shutdown()
