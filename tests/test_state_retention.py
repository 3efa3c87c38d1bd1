"""Checkpoint retention: per-shard state snapshots are prunable once a
newer commit exists — resume restores from the last committed epoch
only, so older snapshots are pure storage cost at web scale."""

import dataclasses
import glob
import os

import pytest

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship
from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink

pytestmark = pytest.mark.usefixtures("ray_session")

CFG = EngineConfig(min_text_len=1, state_shards=4, extract_concurrency=2,
                   files_per_epoch=1)


def _state_files(out: str, epoch: int) -> list[str]:
    d = EpochSink(out).epoch_dir(epoch)
    return sorted(os.path.basename(p)
                  for p in glob.glob(os.path.join(d, "state-*")))


def test_sink_prune_keeps_last_and_is_idempotent(tmp_path, pages_dir):
    d, _, _ = pages_dir
    out = str(tmp_path / "ret_out")
    run_flagship(d, out, config=CFG)
    sink = EpochSink(out)
    epochs = sink.committed_epochs()
    assert len(epochs) >= 4
    assert all(_state_files(out, e) for e in epochs)

    removed, cursor = sink.prune_state_snapshots(keep_last=2)
    assert removed > 0
    assert cursor == epochs[-2]
    for e in epochs[:-2]:
        assert _state_files(out, e) == []
        # data outputs, manifest and the metadata blob survive
        ed = sink.epoch_dir(e)
        assert os.path.exists(os.path.join(ed, "state.pkl"))
        assert glob.glob(os.path.join(ed, "*.parquet"))
        assert sink.is_committed(e)
    for e in epochs[-2:]:
        assert _state_files(out, e)

    again, _ = sink.prune_state_snapshots(keep_last=2)
    assert again == 0  # idempotent

    with pytest.raises(ValueError, match="keep_last"):
        sink.prune_state_snapshots(keep_last=0)


def test_engine_retention_prunes_online_and_resume_still_works(
        tmp_path, pages_dir):
    """retention=2 during the run: old epochs lose their snapshots as
    commits land, outputs stay byte-identical to the keep-all run, and
    a resume after dropping the last manifest restores from the
    still-retained previous epoch."""
    d, _, _ = pages_dir
    ref_out = str(tmp_path / "keepall_out")
    run_flagship(d, ref_out, config=CFG)

    cfg = dataclasses.replace(CFG, state_snapshot_retention=2)
    out = str(tmp_path / "pruned_out")
    summary = run_flagship(d, out, config=cfg)
    assert summary["metrics"]["counters"]["state_snapshots_pruned"] > 0

    sink = EpochSink(out)
    epochs = sink.committed_epochs()
    for e in epochs[:-2]:
        assert _state_files(out, e) == []
    for e in epochs[-2:]:
        assert _state_files(out, e)

    from tests.test_streaming_e2e import _output_hashes
    ref = {k: v for k, v in _output_hashes(ref_out).items()
           if not os.path.basename(k).startswith("state-")}
    got = {k: v for k, v in _output_hashes(out).items()
           if not os.path.basename(k).startswith("state-")}
    assert ref == got

    # drop the final (drain) manifest: resume restores from the
    # previous epoch, which retention=2 kept
    os.remove(sink.manifest_path(epochs[-1]))
    run_flagship(d, out, config=cfg)
    got2 = {k: v for k, v in _output_hashes(out).items()
            if not os.path.basename(k).startswith("state-")}
    assert ref == got2


def test_resume_from_pruned_epoch_fails_loudly(tmp_path, pages_dir):
    d, _, _ = pages_dir
    cfg = dataclasses.replace(CFG, state_snapshot_retention=1)
    out = str(tmp_path / "deep_pruned_out")
    run_flagship(d, out, config=cfg)
    sink = EpochSink(out)
    epochs = sink.committed_epochs()
    # delete manifests past the retention depth: the new "last
    # committed" epoch's snapshots are gone
    for e in epochs[-2:]:
        os.remove(sink.manifest_path(e))
    with pytest.raises(RuntimeError, match="pruned"):
        run_flagship(d, out, config=cfg)
