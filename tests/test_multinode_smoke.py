"""Simulated-cluster smoke: the miniature version of the
scripts/bench_multinode.py protocol that docs/CLUSTER.md §6 promises —
2 nodes with properly sized object stores (the 150 MB default
spill-thrashes; see BASELINE.md), SPREAD state shards crossing the
node boundary, and byte-identical committed output vs a single node.

Runs in subprocesses (fresh Ray sessions), so it coexists with the
shared pytest session fixture."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_node_cluster_byte_identity():
    out = subprocess.run(
        [sys.executable, "scripts/bench_multinode.py"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={**os.environ, "RAY_ADDRESS": "",
             "GRAFT_PAGES_ROWS": "8000",
             "GRAFT_MN_MODES": "2_node,one_node"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["byte_identical"], res
    assert res["2_node"]["n_nodes"] == 2, res  # SPREAD crossed nodes
    assert res["2_node"]["n_files"] > 0
