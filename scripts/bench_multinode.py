"""Bench-scale flagship on a simulated 2-node Ray cluster.

Evidence for the multi-node story that the sandbox cannot provide with
real machines: the SAME 2M-row pages log is run (a) on a simulated
2-node cluster (``ray.cluster_utils.Cluster``, 16 CPUs per node, state
shards SPREAD across nodes so the keyed exchange crosses the node
boundary) and (b) on a plain single-node 32-CPU session — each in a
fresh subprocess. The script reports wall time + throughput for both
and verifies BYTE-IDENTITY of every committed output file (shard->key
hashing is layout-independent by construction, so any divergence is a
bug). Results are recorded in BASELINE.md.

Usage: python scripts/bench_multinode.py  (from the repo root;
GRAFT_PAGES_ROWS overrides the input size, default 2,000,000;
GRAFT_MN_MODES picks the layouts, e.g. "4_node,2_node,one_node" —
an N_node layout gets 32/N CPUs and 16/N GB of object store per node)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(os.environ.get("GRAFT_PAGES_ROWS", "2000000"))

RUN = r"""
import hashlib, json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
mode = {mode!r}
if mode != "one_node":
    from ray.cluster_utils import Cluster
    n_nodes_want = int(mode.split("_")[0])
    per_node = 32 // n_nodes_want
    # the test-cluster default object store is 150MB/node -> constant
    # spill thrash at bench scale; size it like a real worker node
    STORE = (16 // n_nodes_want) * 1024**3
    cluster = Cluster(initialize_head=True, head_node_args={{
        "num_cpus": per_node, "object_store_memory": STORE}})
    for _ in range(n_nodes_want - 1):
        cluster.add_node(num_cpus=per_node, object_store_memory=STORE)
    import ray
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    for _ in range(240):
        if len([n for n in ray.nodes() if n["Alive"]]) >= n_nodes_want:
            break
        time.sleep(0.5)
else:
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")

os.environ["GRAFT_PAGES_ROWS"] = str({rows})
import bench
data_dir = bench.ensure_bench_pages()
for name in sorted(os.listdir(data_dir)):
    if name.endswith(".parquet"):
        open(os.path.join(data_dir, name), "rb").read()
import ray.data as rd
rd.range(64, override_num_blocks=64).map_batches(lambda b: b).materialize()

from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship
out_dir = data_dir + "_mn_" + mode
shutil.rmtree(out_dir, ignore_errors=True)
t0 = time.time()
summary = run_flagship(data_dir, out_dir, config=bench.bench_config(32),
                       resume=False)
dt = time.time() - t0
rows_read = summary["metrics"]["counters"].get("rows_read", 0)

from bitquery_kafka_streams_rust_ray.pipelines.streaming import StateShard
from bitquery_kafka_streams_rust_ray.config import EngineConfig
n_nodes = 1
if mode != "one_node":
    # prove the SPREAD layout actually lands shards on both nodes
    actors = [StateShard.options(scheduling_strategy="SPREAD").remote(
        i, EngineConfig(state_shards=8)) for i in range(8)]
    ray.get([a.ping.remote() for a in actors])
    n_nodes = len(set(ray.get([a.node_id.remote() for a in actors])))

hashes = {{}}
for root, _dirs, files in os.walk(out_dir):
    if "_tmp" in root or "_observability" in root:
        continue
    for f in files:
        p = os.path.join(root, f)
        hashes[os.path.relpath(p, out_dir)] = hashlib.sha256(
            open(p, "rb").read()).hexdigest()
shutil.rmtree(out_dir, ignore_errors=True)
print("MNRESULT " + json.dumps({{
    "mode": mode, "sec": round(dt, 2),
    "docs_per_sec": round(rows_read / dt, 1), "n_nodes": n_nodes,
    "output_sha": hashlib.sha256(json.dumps(
        sorted(hashes.items())).encode()).hexdigest(),
    "n_files": len(hashes)}}))
ray.shutdown()
if mode != "one_node":
    cluster.shutdown()
"""


def run_mode(mode: str) -> dict:
    script = RUN.format(repo=REPO, mode=mode, rows=ROWS)
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=900, cwd=REPO, env={**os.environ, "RAY_ADDRESS": ""},
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-3000:])
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("MNRESULT ")][-1]
    return json.loads(line[len("MNRESULT "):])


def main() -> None:
    modes = os.environ.get("GRAFT_MN_MODES", "2_node,one_node").split(",")
    results = {m: run_mode(m) for m in modes}
    shas = {r["output_sha"] for r in results.values()}
    print(json.dumps({
        "pages_rows": ROWS,
        **results,
        "byte_identical": len(shas) == 1,
    }))


if __name__ == "__main__":
    main()
