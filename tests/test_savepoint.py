"""Savepoint export + fork: a new output dir bootstrapped from a
committed checkpoint continues the stream and commits byte-identical
epochs to the original run — forking the processing, not the history."""

import hashlib
import json
import os

import pytest

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship
from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink
from bitquery_kafka_streams_rust_ray.state.savepoint import (
    export_savepoint, fork_from_savepoint, read_savepoint)

pytestmark = pytest.mark.usefixtures("ray_session")

CFG = EngineConfig(min_text_len=1, state_shards=4, extract_concurrency=2,
                   files_per_epoch=2)


@pytest.fixture(scope="module")
def ref_run(tmp_path_factory):
    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec, generate_host_metadata, generate_pages)

    d = str(tmp_path_factory.mktemp("pages_sp"))
    spec = PagesSpec(num_rows=2_000, seed=42)
    generate_pages(d, spec)
    generate_host_metadata(d, spec)
    out = str(tmp_path_factory.mktemp("sp_ref_out"))
    run_flagship(d, out, config=CFG)
    return d, out


def _epoch_hashes(out_dir: str, min_epoch: int) -> dict[str, str]:
    """sha256 of every committed file in epoch dirs > min_epoch plus
    their manifests (normalized: the fork's bootstrap provenance key is
    only on the savepoint epoch itself, which is excluded)."""
    sink = EpochSink(out_dir)
    h = {}
    for e in sink.committed_epochs():
        if e <= min_epoch:
            continue
        d = sink.epoch_dir(e)
        for f in sorted(os.listdir(d)):
            with open(os.path.join(d, f), "rb") as fh:
                h[f"epoch={e}/{f}"] = hashlib.sha256(
                    fh.read()).hexdigest()
        with open(sink.manifest_path(e), "rb") as fh:
            h[f"manifest-{e}"] = hashlib.sha256(fh.read()).hexdigest()
    return h


def test_fork_commits_byte_identical_epochs(ref_run, tmp_path):
    d, ref_out = ref_run
    sp = str(tmp_path / "savepoint")
    man = export_savepoint(ref_out, sp, epoch=1)
    assert man["epoch"] == 1
    assert read_savepoint(sp)["watermark_us"] == man["watermark_us"]
    # savepoint is self-contained: state pickles + watermark + manifest
    assert "state.pkl" in os.listdir(sp)

    fork_out = str(tmp_path / "fork_out")
    boot = fork_from_savepoint(sp, fork_out)
    assert boot["epoch"] == 1
    assert boot["watermark_us"] == man["watermark_us"]
    # bootstrap epoch carries state only — no data outputs
    assert not any(n.endswith(".parquet") for n in boot["outputs"])

    run_flagship(d, fork_out, config=CFG, resume=True)

    ref_h = _epoch_hashes(ref_out, min_epoch=1)
    got_h = _epoch_hashes(fork_out, min_epoch=1)
    assert set(got_h) == set(ref_h)
    diff = {k for k in ref_h if ref_h[k] != got_h[k]}
    assert not diff, f"fork diverged from the original: {sorted(diff)[:8]}"

    # the fork's lineage records where it came from
    boot_man = EpochSink(fork_out).read_manifest(1)
    assert boot_man["savepoint"]["source_out_dir"] == \
        os.path.abspath(ref_out)


def test_one_savepoint_seeds_many_forks(ref_run, tmp_path):
    d, ref_out = ref_run
    sp = str(tmp_path / "sp")
    export_savepoint(ref_out, sp, epoch=2)
    outs = []
    for i in range(2):
        fo = str(tmp_path / f"fork{i}")
        fork_from_savepoint(sp, fo)
        run_flagship(d, fo, config=CFG, resume=True)
        outs.append(_epoch_hashes(fo, min_epoch=2))
    assert outs[0] == outs[1]


def test_export_refusals(ref_run, tmp_path):
    d, ref_out = ref_run
    sink = EpochSink(ref_out)
    drain_epoch = sink.committed_epochs()[-1]
    assert sink.read_manifest(drain_epoch)["drain"]
    with pytest.raises(ValueError, match="drain"):
        export_savepoint(ref_out, str(tmp_path / "x"), epoch=drain_epoch)
    with pytest.raises(ValueError, match="not committed"):
        export_savepoint(ref_out, str(tmp_path / "x"), epoch=99)
    # default epoch skips the drain and lands on the last DATA epoch
    man = export_savepoint(ref_out, str(tmp_path / "sp_default"))
    assert man["epoch"] == drain_epoch - 1


def test_fork_refuses_non_empty_target(ref_run, tmp_path):
    _d, ref_out = ref_run
    sp = str(tmp_path / "sp")
    export_savepoint(ref_out, sp, epoch=1)
    fo = str(tmp_path / "fork")
    fork_from_savepoint(sp, fo)
    with pytest.raises(ValueError, match="committed epochs"):
        fork_from_savepoint(sp, fo)


def test_fork_resume_refuses_changed_config(ref_run, tmp_path):
    """The savepoint carries the source's config fingerprint; a fork
    resumed under a different semantic contract must refuse."""
    import dataclasses

    d, ref_out = ref_run
    sp = str(tmp_path / "sp")
    export_savepoint(ref_out, sp, epoch=1)
    fo = str(tmp_path / "fork")
    fork_from_savepoint(sp, fo)
    bad = dataclasses.replace(CFG, min_text_len=200)
    with pytest.raises(RuntimeError, match="refusing to resume"):
        run_flagship(d, fo, config=bad, resume=True)
