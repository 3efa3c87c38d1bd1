"""Production configuration profile — the ``examples/production_config.rs`` analog.

The reference example builds a tuned ``Config`` (larger batches, more
workers, higher in-flight limits, a harder retry budget), validates it,
and prints the result. This engine's analog: start from
``EngineConfig`` defaults, apply a production profile (bigger Arrow
batches, one state shard per core, larger epochs, fsync'd commits, an
extended replay budget), layer environment overrides on top via the
typed ``GRAFT_CFG_*`` walk, fail fast through ``validate()``, then
prove the profile actually drives a run.

The reference knobs this profile mirrors:

- ``parallel_workers = num_cpus * 2``  -> ``state_shards`` /
  ``extract_concurrency`` (src/config.rs:266; production_config.rs)
- ``batch_size = 1000``                -> ``batch_size=4096`` (columnar
  batches are cheap; config/production.env:22)
- ``retry.max_retries = 10``           -> ``epoch_replay_budget=4``
  (replays are whole-epoch units, not per-message retries)
- queue caps / backpressure thresholds -> provided by Ray Data's
  streaming executor; nothing to tune by hand.

Run from the repo root: ``python examples/production_config.py``
"""

import dataclasses
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.pipelines.flagship import ensure_pages_log
from bitquery_kafka_streams_rust_ray.pipelines.streaming import (
    StreamingPagesPipeline,
)
from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec

ncpus = int(ray.available_resources().get("CPU", 4))

# --- the production profile (production_config.rs analog) ---------------
profile = {
    "batch_size": 4096,            # columnar batches; ref BATCH_SIZE=1000
    "read_batch_size": 1024,       # wide html rows still bound per-read
    "state_shards": ncpus,         # ref parallel_workers = num_cpus
    "extract_concurrency": ncpus,
    "files_per_epoch": 4,          # minutes-long epochs in production
    "fsync_output": True,          # machine-crash durability for commits
    "epoch_replay_budget": 4,      # ref retry.max_retries=10 analog
    "collect_dataset_stats": True, # per-epoch Dataset.stats() audit trail
}

# --- env overrides layered on top (main.rs:106-156 analog) --------------
# Any GRAFT_CFG_* variable wins over the profile — demonstrate with one.
os.environ.setdefault("GRAFT_CFG_DEDUP_WINDOW_S", "600")
base = EngineConfig.from_env()          # defaults + env, validated
cfg = dataclasses.replace(base, **profile, min_text_len=1)
cfg.validate()                          # fail fast (config.rs:43-49)

print("production profile (validated):")
for f in dataclasses.fields(cfg):
    v = getattr(cfg, f.name)
    mark = " <- env" if f.name == "dedup_window_s" else (
        " <- profile" if f.name in profile else "")
    print(f"  {f.name:22s} = {v}{mark}")

# --- prove the profile runs -------------------------------------------
data_dir = "/tmp/bitquery_kafka_streams_rust_ray_example_prod"
# span_s must stay comfortably above lateness_s * num_slices/span ratio:
# each arrival slice covers span_s/num_slices of event time, and rows may
# arrive up to lateness_s out of order. A slice narrower than the disorder
# bound would mass-drop rows as late (watermark outruns the data).
ensure_pages_log(data_dir, PagesSpec(num_rows=20000, span_s=1800))
out_dir = f"{data_dir}_out"
shutil.rmtree(out_dir, ignore_errors=True)

summary = StreamingPagesPipeline(data_dir, out_dir, cfg).run()
counters = summary["metrics"].get("counters", summary["metrics"])
print("run under production profile: epochs:", summary["epochs"],
      "counters:", {k: v for k, v in sorted(counters.items())
                    if isinstance(v, (int, float))})

ray.shutdown()
sys.exit(0)
