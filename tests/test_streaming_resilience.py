"""Resilience-path tests: drain-resume semantics, replay fencing,
metadata-ingest idempotency."""

import os
import shutil

import pandas as pd
import pyarrow as pa
import pytest

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.functions.filters import PageFilter
from bitquery_kafka_streams_rust_ray.pipelines.streaming import (
    StateShard,
    StreamingPagesPipeline,
)
from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink

pytestmark = pytest.mark.usefixtures("ray_session")

CFG = EngineConfig(min_text_len=1, state_shards=4, extract_concurrency=2,
                   files_per_epoch=2)


def _meta(d):
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()


@pytest.fixture(scope="module")
def drained_run(pages_dir, tmp_path_factory):
    d, _, _ = pages_dir
    out = str(tmp_path_factory.mktemp("drain_out"))
    summary = StreamingPagesPipeline(
        d, out, CFG, PageFilter(min_text_len=1), _meta(d)
    ).run(resume=True)
    return d, out, summary


def test_resume_after_drain_unchanged_is_noop(drained_run):
    """Resuming a finished (drained) run over unchanged input returns the
    committed summary without re-executing or erroring."""
    d, out, summary = drained_run
    again = StreamingPagesPipeline(
        d, out, CFG, PageFilter(min_text_len=1), _meta(d)
    ).run(resume=True)
    assert again["epochs"] == summary["epochs"]
    assert again["watermark_us"] == summary["watermark_us"]


def test_resume_after_drain_refuses_grown_input(drained_run, tmp_path):
    """New input appended after a drain must be refused loudly: the drain
    commit occupies the next epoch id and its watermark would silently
    drop every appended row as late."""
    d, out, _ = drained_run
    grown = str(tmp_path / "grown_input")
    shutil.copytree(d, grown)
    # grown output dir shares the committed manifests of the drained run
    grown_out = str(tmp_path / "grown_out")
    shutil.copytree(out, grown_out)
    # append a new arrival slice (slice index beyond all existing ones)
    src = sorted(f for f in os.listdir(d) if f.startswith("pages-"))[0]
    shutil.copy(os.path.join(d, src),
                os.path.join(grown, "pages-9999-00.parquet"))
    with pytest.raises(RuntimeError, match="drain"):
        StreamingPagesPipeline(
            grown, grown_out, CFG, PageFilter(min_text_len=1), _meta(d)
        ).run(resume=True)


def test_ingest_metadata_idempotent_per_epoch(pages_dir, tmp_path):
    """The in-run replay path re-calls _ingest_metadata for the same
    epoch; the slice must fold into the accumulated broadcast state
    exactly once."""
    d, _, _ = pages_dir
    meta = _meta(d)
    cut = len(meta) // 2
    slices = {0: meta.iloc[:cut], 1: meta.iloc[cut:]}
    pipe = StreamingPagesPipeline(
        d, str(tmp_path / "meta_out"), CFG, PageFilter(min_text_len=1),
        host_metadata=None, metadata_slices=slices,
    )
    pipe._ingest_metadata(0)
    n0 = len(pipe._meta_acc)
    pipe._ingest_metadata(0)  # replay of epoch 0
    assert len(pipe._meta_acc) == n0
    pipe._ingest_metadata(1)
    assert len(pipe._meta_acc) == len(meta)
    pipe._ingest_metadata(1)
    assert len(pipe._meta_acc) == len(meta)


def test_state_shard_discards_stale_attempt_pushes():
    """After drop_epoch bumps the attempt, straggler pushes from the
    failed attempt are discarded instead of duplicating replayed rows."""
    import ray

    shard = StateShard.remote(0, CFG)
    t = pa.table({"url": ["a"], "_ts_us": [1]})
    assert ray.get(shard.accept_rows.remote(5, t, 0)) == 1
    ray.get(shard.drop_epoch.remote(5, 1))
    # straggler from attempt 0: dropped
    assert ray.get(shard.accept_rows.remote(5, t, 0)) == 0
    # replay attempt 1: accepted
    assert ray.get(shard.accept_rows.remote(5, t, 1)) == 1
    ray.kill(shard)


def test_drained_output_counters_match_partial_then_resume(pages_dir,
                                                           tmp_path):
    """Interrupt before drain, resume to completion: per-epoch manifests
    must equal an uninterrupted run's (exactly-once bookkeeping)."""
    d, _, _ = pages_dir
    ref_out = str(tmp_path / "ref_out")
    StreamingPagesPipeline(
        d, ref_out, CFG, PageFilter(min_text_len=1), _meta(d)
    ).run(resume=False)

    part_out = str(tmp_path / "part_out")
    pipe = StreamingPagesPipeline(
        d, part_out, CFG, PageFilter(min_text_len=1), _meta(d)
    )
    # run without drain, drop the last manifest => a mid-stream crash
    pipe.run(resume=False, drain=False)
    sink = EpochSink(part_out)
    os.remove(sink.manifest_path(sink.committed_epochs()[-1]))
    StreamingPagesPipeline(
        d, part_out, CFG, PageFilter(min_text_len=1), _meta(d)
    ).run(resume=True)

    ref_sink, got_sink = EpochSink(ref_out), EpochSink(part_out)
    assert got_sink.committed_epochs() == ref_sink.committed_epochs()
    for e in ref_sink.committed_epochs():
        ref_m, got_m = ref_sink.read_manifest(e), got_sink.read_manifest(e)
        assert got_m["counters"] == ref_m["counters"], f"epoch {e}"


def test_resume_refuses_changed_epoch_grouping(pages_dir, tmp_path):
    """Manifests record each epoch's input files; resuming with a
    files_per_epoch that regroups those files must refuse instead of
    silently skipping/double-processing data."""
    import dataclasses

    d, _, _ = pages_dir
    out = str(tmp_path / "regroup_out")
    StreamingPagesPipeline(
        d, out, CFG, PageFilter(min_text_len=1), _meta(d)
    ).run(resume=False, drain=False)
    assert EpochSink(out).committed_epochs()  # data epochs on disk

    regrouped = dataclasses.replace(CFG, files_per_epoch=1)
    with pytest.raises(RuntimeError, match="files_per_epoch"):
        StreamingPagesPipeline(
            d, out, regrouped, PageFilter(min_text_len=1), _meta(d)
        ).run(resume=True)

    # same grouping resumes fine (finishes with the drain commit)
    summary = StreamingPagesPipeline(
        d, out, CFG, PageFilter(min_text_len=1), _meta(d)
    ).run(resume=True)
    assert summary["metrics"] is not None


def test_incremental_resume_appended_slices_byte_identical(pages_dir,
                                                           tmp_path):
    """Continuous ingest: run over the first half of the arrival slices
    WITHOUT draining, append the rest, resume — every committed byte
    must equal a single uninterrupted run over the full log. (The epoch
    plan of the partial input is a prefix of the full plan, so resume
    picks up at exactly the next data epoch with the restored
    watermark/state.)"""
    import glob

    d, spec, _ = pages_dir
    half = spec.num_slices // 2

    part = str(tmp_path / "part_input")
    os.makedirs(part)
    for p in glob.glob(os.path.join(d, "*.parquet")):
        base = os.path.basename(p)
        if base.startswith("pages-"):
            if int(base.split("-")[1]) >= half:
                continue
        shutil.copy(p, os.path.join(part, base))

    out = str(tmp_path / "inc_out")
    StreamingPagesPipeline(
        part, out, CFG, PageFilter(min_text_len=1), _meta(d)
    ).run(resume=False, drain=False)
    n_first = len(EpochSink(out).committed_epochs())
    assert 0 < n_first  # the partial run committed its data epochs

    # data "arrives": resume over the FULL input dir, drain to finish
    summary = StreamingPagesPipeline(
        d, out, CFG, PageFilter(min_text_len=1), _meta(d)
    ).run(resume=True, drain=True)
    assert summary["metrics"]["counters"]["rows_read"] > 0

    ref_out = str(tmp_path / "ref_out")
    StreamingPagesPipeline(
        d, ref_out, CFG, PageFilter(min_text_len=1), _meta(d)
    ).run(resume=False, drain=True)

    from tests.test_streaming_e2e import _output_hashes
    assert _output_hashes(out) == _output_hashes(ref_out)


def test_received_rows_counter_tracks_current_attempt_only(tmp_path):
    """The exchange barrier's shard-side counter: rows buffered for the
    CURRENT attempt only. Pushes before a drop_epoch (replay fence
    bump) are discarded AND vanish from the count; stale-attempt pushes
    landing after the bump contribute nothing. This is what lets the
    driver equate received==pushed with 'every row of THIS attempt is
    buffered'."""
    import ray

    shard = StateShard.remote(0, EngineConfig(min_text_len=1))
    t = pa.table({"url": ["a", "b"], "_ts_us": [1, 2]})

    assert ray.get(shard.received_rows.remote(5)) == 0
    ray.get(shard.accept_rows.remote(5, t, 0))
    ray.get(shard.accept_rows.remote(5, t, 0))
    assert ray.get(shard.received_rows.remote(5)) == 4

    # replay fence: attempt bumps, count resets with the buffers
    ray.get(shard.drop_epoch.remote(5, 1))
    assert ray.get(shard.received_rows.remote(5)) == 0
    ray.get(shard.accept_rows.remote(5, t, 0))  # stale attempt: no-op
    assert ray.get(shard.received_rows.remote(5)) == 0
    ray.get(shard.accept_rows.remote(5, t, 1))  # current attempt counts
    assert ray.get(shard.received_rows.remote(5)) == 2
    ray.kill(shard)


def test_finalized_epoch_rejects_straggler_pushes(tmp_path):
    """Reviewer finding: with async pushes a straggler from a
    pre-replay attempt can land AFTER finalize. The fence must stay up
    permanently — re-accepting would leak the dead epoch's buffer
    forever."""
    import ray

    shard = StateShard.remote(0, EngineConfig(min_text_len=1))
    t = pa.table({"url": ["a"], "_ts_us": [1],
                  "warc_ts": pd.to_datetime(["2024-01-01"]).astype(
                      "datetime64[us]"),
                  "lang": ["en"], "host": ["h"], "text": ["x"],
                  "text_len": [1]})
    ray.get(shard.accept_rows.remote(0, t, 1))
    stage = tmp_path / "stage"
    stage.mkdir()
    ray.get(shard.finalize_epoch.remote(0, str(stage)))
    # the straggler from failed attempt 0 lands after finalize
    assert ray.get(shard.accept_rows.remote(0, t, 0)) == 0
    assert ray.get(shard.received_rows.remote(0)) == 0
    # and even a same-attempt duplicate is dead: the epoch is done
    assert ray.get(shard.accept_rows.remote(0, t, 1)) == 0
    ray.kill(shard)


def test_lease_takeover_fences_live_pipeline(pages_dir, tmp_path):
    """End-to-end ADVICE scenario: driver A stalls past its lease
    mid-run; driver B steals the lock and completes the run; A wakes
    and must die with LockLostError WITHOUT retrying (a fenced driver
    replaying would race the new owner) and without disturbing B's
    committed output — which must equal a clean single-driver run."""
    import dataclasses
    import hashlib
    import time

    import pyarrow.parquet as pq

    from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship
    from bitquery_kafka_streams_rust_ray.sinks.exactly_once import LockLostError

    d, spec, _ = pages_dir
    cfg = dataclasses.replace(CFG, lock_lease_s=0.5)

    ref_out = str(tmp_path / "clean_ref")
    run_flagship(d, ref_out, config=cfg)

    out = str(tmp_path / "raced_out")
    real = StreamingPagesPipeline._exchange_epoch
    state = {"stalled": False, "b_error": None}

    def stalling(self, epoch, files, actors, watermark, attempt=0):
        if epoch == 1 and not state["stalled"]:
            state["stalled"] = True
            time.sleep(0.8)  # outlive the 0.5s lease, no heartbeat fires
            # B takes over the stale lock and runs to completion
            StreamingPagesPipeline._exchange_epoch = real
            try:
                run_flagship(d, out, config=cfg, resume=True)
            except Exception as exc:  # pragma: no cover - diagnostic
                state["b_error"] = exc
        return real(self, epoch, files, actors, watermark, attempt)

    StreamingPagesPipeline._exchange_epoch = stalling
    try:
        with pytest.raises(LockLostError):
            run_flagship(d, out, config=cfg)
    finally:
        StreamingPagesPipeline._exchange_epoch = real
    assert state["b_error"] is None, state["b_error"]

    # B's committed bytes are untouched by A's death throes and equal
    # the clean reference run
    def hashes(root_dir):
        out_h = {}
        for root, _dirs, files in os.walk(root_dir):
            if "_tmp" in root or "_observability" in root:
                continue
            for f in files:
                if f == "_lock":
                    continue
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    out_h[os.path.relpath(p, root_dir)] = hashlib.sha256(
                        fh.read()).hexdigest()
        return out_h

    ref_h, got_h = hashes(ref_out), hashes(out)
    assert set(got_h) == set(ref_h)
    assert all(got_h[k] == ref_h[k] for k in ref_h), [
        k for k in ref_h if got_h[k] != ref_h[k]][:5]
