"""The operational CLI (python -m bitquery_kafka_streams_rust_ray ...): run / show /
savepoint / fork / compact / gen-pages as subprocesses, config via
GRAFT_CFG_* env — the analog of driving the reference's binaries."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(*args, env=None, check=True):
    e = dict(os.environ)
    e.pop("RAY_ADDRESS", None)  # CLI owns its own local session
    if env:
        e.update(env)
    r = subprocess.run(
        [sys.executable, "-m", "bitquery_kafka_streams_rust_ray", *args],
        cwd=REPO, env=e, capture_output=True, text=True, timeout=600)
    if check and r.returncode != 0:
        raise AssertionError(
            f"cli {args} rc={r.returncode}\nstdout:{r.stdout}\n"
            f"stderr:{r.stderr[-2000:]}")
    return r


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_pages"))
    out = str(tmp_path_factory.mktemp("cli_out"))
    r = _cli("gen-pages", d, "--rows", "800", "--seed", "7")
    assert json.loads(r.stdout.strip())["rows"] == 800
    r = _cli("run", d, out,
             env={"GRAFT_CFG_MIN_TEXT_LEN": "1",
                  "GRAFT_CFG_STATE_SHARDS": "2",
                  "GRAFT_CFG_EXTRACT_CONCURRENCY": "2",
                  "RAY_GRAFT_CPUS": "4"})
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    return d, out, summary


def test_run_and_show(cli_run):
    _d, out, summary = cli_run
    assert summary["counters"]["rows_written"] > 0
    assert "state_dedup_keys" in summary["gauges"]

    shown = json.loads(_cli("show", out).stdout.strip())
    assert shown["drained"] is True
    assert shown["epochs"]
    assert shown["outputs"]["tumbling_lang"] > 0
    assert shown["outputs"]["pages"] == shown["counters"]["rows_written"]
    assert shown["counters"]["rows_written"] > 0


def test_savepoint_fork_and_compact(cli_run, tmp_path):
    _d, out, _ = cli_run
    sp = str(tmp_path / "sp")
    man = json.loads(_cli("savepoint", out, sp, "--epoch", "1").stdout)
    assert man["epoch"] == 1

    fork = str(tmp_path / "fork")
    forked = json.loads(_cli("fork", sp, fork).stdout)
    assert forked["epoch"] == 1
    shown = json.loads(_cli("show", fork).stdout.strip())
    assert shown["epochs"] == [1]
    assert shown["savepoint"]["source_out_dir"] == os.path.abspath(out)

    compacted = json.loads(_cli("compact", out).stdout.strip())
    assert isinstance(compacted, dict) and compacted

    # config typo fails fast with a named variable, not a silent ignore
    r = _cli("show", out, env={}, check=True)  # sanity: show ignores cfg
    r = _cli("run", "x", "y", env={"GRAFT_CFG_STATE_SHRDS": "2"},
             check=False)
    assert r.returncode != 0
    assert "GRAFT_CFG_STATE_SHRDS" in (r.stderr + r.stdout)


def test_unknown_epoch_refused(cli_run, tmp_path):
    _d, out, _ = cli_run
    r = _cli("savepoint", out, str(tmp_path / "x"), "--epoch", "99",
             check=False)
    assert r.returncode == 2
    assert "not committed" in r.stderr
