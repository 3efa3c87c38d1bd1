"""Per-minute volume monitor — the ``examples/dex_monitor.rs`` analog.

The reference resets wall-clock atomics every 60 s
(``examples/dex_monitor.rs:31-51``); this engine expresses the same
report as event-time tumbling windows that close as the watermark
passes, printed per epoch.

Run from the repo root: ``python examples/pages_monitor.py``
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.pipelines.flagship import (
    ensure_pages_log,
    flagship_outputs,
    run_flagship,
)
from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec

data_dir = "/tmp/bitquery_kafka_streams_rust_ray_example_monitor"
out_dir = data_dir + "_out"
ensure_pages_log(data_dir, PagesSpec(num_rows=20000, span_s=1200))
shutil.rmtree(out_dir, ignore_errors=True)

# base settings + GRAFT_CFG_* env overrides — the reference's
# load_configuration + env override pass (main.rs:106-156): e.g.
#   GRAFT_CFG_WINDOWS_TUMBLING_SIZE_S=30 python examples/pages_monitor.py
base = {
    "GRAFT_CFG_MIN_TEXT_LEN": "1",
    "GRAFT_CFG_WINDOWS_TUMBLING_SIZE_S": "60",
    "GRAFT_CFG_WINDOWS_SLIDING_SIZE_S": "120",
    "GRAFT_CFG_WINDOWS_SLIDING_SLIDE_S": "60",
    "GRAFT_CFG_WINDOWS_SESSION_GAP_S": "180",
}
overrides = {k: v for k, v in os.environ.items()
             if k.startswith("GRAFT_CFG_")}
cfg = EngineConfig.from_env(env={**base, **overrides})
summary = run_flagship(data_dir, out_dir, config=cfg, resume=False)

windows = flagship_outputs(out_dir)["tumbling_lang"].to_pandas()
print("\nper-minute per-lang volume (closed event-time windows):")
print(windows.sort_values(["window_start", "key"]).head(20).to_string(index=False))
print("\nlineage counters:", summary["metrics"]["counters"])

ray.shutdown()
sys.exit(0)
