"""Preflight smoke test — the ``examples/connection_test.rs`` /
``direct_connection_test.rs`` analog.

The reference's connection tests validate config, verify SSL cert
paths exist, connect to the broker, and pull a handful of events with
a timeout, printing diagnostics at each step. This engine's "broker"
is a parquet pages log, so the analog checks, in order:

1. config validates (``SdkConfig`` check analog);
2. the source directory exists and lists log files (cert-path check);
3. the schema carries every column the pipeline needs (topic check);
4. a bounded sample of rows actually arrives through ``ray.data``
   (the pull-5-events-with-timeout loop, connection_test.rs:45-78);
5. one tiny epoch runs end-to-end and commits (direct test analog).

Exit code 0 = safe to launch the real job. Run from the repo root:
``python examples/preflight.py [data_dir]``
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.pipelines.flagship import (
    ensure_pages_log,
    run_flagship,
)
from bitquery_kafka_streams_rust_ray.sources.pages import (
    PagesSpec,
    pages_files,
    read_pages,
)

REQUIRED_COLS = {"url", "warc_ts", "html", "lang"}  # flagship's pruned read

data_dir = sys.argv[1] if len(sys.argv) > 1 else None
if data_dir is None:
    data_dir = "/tmp/bitquery_kafka_streams_rust_ray_example_preflight"
    ensure_pages_log(data_dir, PagesSpec(num_rows=2000, span_s=600))

failures = 0


def check(name: str, ok: bool, detail: str = "") -> None:
    global failures
    print(f"  [{'ok' if ok else 'FAIL'}] {name}" + (f" — {detail}" if detail else ""))
    failures += 0 if ok else 1


print("preflight checks:")

# 1. config validates
try:
    cfg = EngineConfig.from_env()
    cfg.validate()
    check("config", True, f"{cfg.state_shards} shards, "
          f"dedup_window_s={cfg.dedup_window_s}")
except Exception as e:  # noqa: BLE001 — report, don't crash preflight
    check("config", False, str(e))

# 2. source reachable
files = pages_files(data_dir) if os.path.isdir(data_dir) else []
check("source dir", bool(files), f"{len(files)} log files under {data_dir}")

# 3. schema has what the pipeline reads
schema_ok, missing = False, REQUIRED_COLS
if files:
    import pyarrow.parquet as pq

    names = set(pq.read_schema(files[0]).names)
    missing = REQUIRED_COLS - names
    schema_ok = not missing
check("schema", schema_ok,
      "all pipeline columns present" if schema_ok else f"missing {sorted(missing)}")

# 4. rows actually arrive (bounded sample, timed)
if files:
    t0 = time.monotonic()
    sample = read_pages(data_dir, columns=["url", "warc_ts"]).limit(5).take(5)
    dt = time.monotonic() - t0
    check("sample read", len(sample) == 5,
          f"5 rows in {dt:.2f}s, first url={sample[0]['url'][:40]}")
else:
    check("sample read", False, "no files to read")

# 5. one tiny end-to-end epoch commits
out_dir = f"{data_dir}_preflight_out"
shutil.rmtree(out_dir, ignore_errors=True)
try:
    summary = run_flagship(data_dir, out_dir, EngineConfig(min_text_len=1))
    rows = summary["metrics"].get("counters", summary["metrics"]).get(
        "rows_written", 0)
    check("end-to-end epoch", summary["epochs"] != [] and rows > 0,
          f"epochs={summary['epochs']} rows_written={int(rows)}")
except Exception as e:  # noqa: BLE001
    check("end-to-end epoch", False, str(e))
finally:
    shutil.rmtree(out_dir, ignore_errors=True)

print("preflight:", "PASS — safe to launch" if failures == 0
      else f"{failures} check(s) FAILED")
ray.shutdown()
sys.exit(1 if failures else 0)
