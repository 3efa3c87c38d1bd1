"""Multi-node placement: StateShard actors must SPREAD across nodes.

Runs in a subprocess with its own simulated 2-node Ray cluster
(`ray.cluster_utils.Cluster`) so it cannot collide with the session-
scoped single-node fixture. Asserts (a) the shards land on more than
one node — `num_cpus=0` actors would otherwise pack onto the head
node — and (b) flagship output is byte-identical to the single-node
run (shard->key hashing is layout-independent by construction).
"""

import json
import os
import subprocess
import sys

import pytest

SCRIPT = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
from ray.cluster_utils import Cluster

cluster = Cluster(initialize_head=True, head_node_args={"num_cpus": 2})
cluster.add_node(num_cpus=2)
import ray
ray.init(address=cluster.address, include_dashboard=False,
         logging_level="ERROR")

# under load the second node can register late; SPREAD packs onto the
# head node if it schedules before both nodes are visible
import time
for _ in range(120):
    if len([n for n in ray.nodes() if n["Alive"]]) >= 2:
        break
    time.sleep(0.5)

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.pipelines.streaming import StateShard

cfg = EngineConfig(state_shards=4)
actors = [StateShard.options(scheduling_strategy="SPREAD").remote(i, cfg)
          for i in range(cfg.state_shards)]
ray.get([a.ping.remote() for a in actors])
node_ids = ray.get([a.node_id.remote() for a in actors])

# run the flagship on this 2-node layout; output bytes must match any
# other layout's run over the same input
import hashlib
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship

pages_dir = %(pages)r
out_dir = %(out)r
run_flagship(pages_dir, out_dir,
             config=EngineConfig(min_text_len=1, state_shards=4,
                                 files_per_epoch=2), resume=False)
hashes = {}
for root, _dirs, files in os.walk(out_dir):
    if "_tmp" in root or "_observability" in root:
        continue
    for f in files:
        p = os.path.join(root, f)
        with open(p, "rb") as fh:
            hashes[os.path.relpath(p, out_dir)] = hashlib.sha256(
                fh.read()).hexdigest()
print(json.dumps({"n_actors": len(node_ids),
                  "n_nodes": len(set(node_ids)), "hashes": hashes}))
ray.shutdown()
cluster.shutdown()
"""


@pytest.mark.usefixtures("ray_session")
def test_state_shards_spread_across_nodes(pages_dir, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d, _, _ = pages_dir
    two_node_out = str(tmp_path / "two_node_out")
    script = tmp_path / "spread_probe.py"
    script.write_text(SCRIPT % {"repo": repo, "pages": d,
                                "out": two_node_out})
    # two attempts: the subprocess spins its own 2-node cluster and can
    # lose the race for CPUs/ports when the full suite (plus sandbox
    # noisy neighbors) is saturating the box
    rec = None
    for attempt in range(3):
        out = subprocess.run(
            [sys.executable, str(script)], capture_output=True, text=True,
            timeout=540, cwd=repo,
            env={**os.environ, "RAY_ADDRESS": ""},
        )
        if out.returncode != 0:
            continue
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        # a saturated box can still schedule before node 2 is usable;
        # only a REPEATED pack is a real SPREAD regression
        if rec["n_nodes"] == 2:
            break
    assert out.returncode == 0, out.stderr[-2000:]
    assert rec is not None and rec["n_actors"] == 4
    # SPREAD must use both nodes; default packing would give 1
    assert rec["n_nodes"] == 2, rec

    # same input on THIS (single-node) session: byte-identical output
    import hashlib

    from bitquery_kafka_streams_rust_ray.config import EngineConfig
    from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship

    one_node_out = str(tmp_path / "one_node_out")
    run_flagship(d, one_node_out,
                 config=EngineConfig(min_text_len=1, state_shards=4,
                                     files_per_epoch=2), resume=False)
    hashes = {}
    for root, _dirs, files in os.walk(one_node_out):
        if "_tmp" in root or "_observability" in root:
            continue
        for f in files:
            p = os.path.join(root, f)
            with open(p, "rb") as fh:
                hashes[os.path.relpath(p, one_node_out)] = hashlib.sha256(
                    fh.read()).hexdigest()
    assert hashes == rec["hashes"]
