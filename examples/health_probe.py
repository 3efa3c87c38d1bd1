"""Observability surface demo — the ``examples/health_check.rs`` analog.

Runs the flagship pipeline with the HTTP observability server enabled
(``EngineConfig.http_port=0`` → ephemeral port) and probes
``/health /ready /live /metrics /version`` while the job streams,
printing what a kubelet-style poller would see.

Run from the repo root: ``python examples/health_probe.py``
"""

import json
import os
import shutil
import sys
import threading
import time
import urllib.error
import urllib.request

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

data_dir = "/tmp/bitquery_kafka_streams_rust_ray_example_health"
ensure_pages_log(data_dir, PagesSpec(num_rows=20000))
out_dir = f"{data_dir}_out"
shutil.rmtree(out_dir, ignore_errors=True)

pipe = StreamingPagesPipeline(
    data_dir, out_dir,
    EngineConfig(min_text_len=1, state_shards=4, http_port=0),
)


def probe():
    for _ in range(400):
        srv = getattr(pipe, "http_server", None)
        if srv is None:
            time.sleep(0.05)
            continue
        for path in ("/ready", "/live", "/health", "/version"):
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{srv.port}{path}", timeout=5) as r:
                    body = json.loads(r.read())
                    print(f"GET {path} -> {r.status}: "
                          f"{json.dumps(body)[:120]}")
            except urllib.error.HTTPError as e:
                print(f"GET {path} -> {e.code}")
        return


t = threading.Thread(target=probe)
t.start()
summary = pipe.run(resume=False)
t.join()
print("run finished:", summary["epochs"], "epochs committed;",
      "health.json written per epoch under _observability/")
ray.shutdown()
