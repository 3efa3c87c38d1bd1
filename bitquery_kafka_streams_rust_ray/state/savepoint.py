"""Savepoints: export a committed checkpoint and fork a new run from it.

The Flink-savepoint analog for this engine. A savepoint is a
self-contained directory holding one committed epoch's per-shard state
snapshots (pickles + spill-dedup sqlite sidecars), the watermark
snapshot, and a manifest recording everything a resume needs
(``watermark_us``, ``config_fp``, ``input_files``, counters).

``fork_from_savepoint`` bootstraps a NEW output directory from it: a
metadata-only epoch commit that carries the state but none of the
historical data outputs, so a resumed run continues at the next epoch —
forking the *processing*, not the history. Every epoch the fork commits
afterwards is byte-identical to the one the original run commits for
the same input (pinned in ``tests/test_savepoint.py``), because resume
semantics are a pure function of (state snapshot, watermark, plan).

Analog in the reference: a consumer group's committed offsets can seed
a NEW group that continues from the same position without re-reading
history (``src/consumer.rs`` group semantics) — here the "offset" is
the epoch id and the keyed state that position implies.

Differences from the two sibling recovery paths:

* resume (same out_dir)  — continues the same run under the same lock;
* rescale (same out_dir) — resume with a different shard count;
* fork (NEW out_dir)     — a separate run lineage with its own lock,
  own manifests and own downstream outputs, starting from the
  savepoint's position. The savepoint directory itself is immutable
  and can seed any number of forks.
"""

from __future__ import annotations

import json
import os
import shutil

from ..sinks.exactly_once import EpochSink

_MANIFEST = "savepoint.json"
_STATE_PREFIX = "state"


def _state_files(epoch_dir: str) -> list[str]:
    """The state members of a committed epoch dir: ``state.pkl``
    (watermark + shard count), ``state-NNNN.pkl`` (per-shard pickles)
    and ``state-NNNN.pkl.dedup.sqlite`` (spill-dedup sidecars)."""
    return sorted(
        f for f in os.listdir(epoch_dir)
        if f == "state.pkl"
        or (f.startswith(_STATE_PREFIX + "-")
            and (f.endswith(".pkl") or f.endswith(".dedup.sqlite")))
    )


def export_savepoint(out_dir: str, savepoint_dir: str,
                     epoch: int | None = None) -> dict:
    """Export a committed epoch's checkpoint into ``savepoint_dir``.

    Defaults to the latest committed DATA epoch. Refuses a drain commit
    (the run is finished — nothing to continue) and an epoch whose
    state snapshots were pruned by ``state_snapshot_retention``.
    Returns the savepoint manifest.
    """
    sink = EpochSink(out_dir)
    committed = sink.committed_epochs()
    if not committed:
        raise ValueError(f"{out_dir} has no committed epochs")
    if epoch is None:
        epoch = committed[-1]
        man = sink.read_manifest(epoch)
        if man.get("drain") and len(committed) > 1:
            epoch = committed[-2]
            man = sink.read_manifest(epoch)
    else:
        if epoch not in committed:
            raise ValueError(f"epoch {epoch} is not committed in {out_dir}")
        man = sink.read_manifest(epoch)
    if man.get("drain"):
        raise ValueError(
            f"epoch {epoch} is a drain commit — the run is finished; "
            "a savepoint can only continue an unfinished stream")
    epoch_dir = sink.epoch_dir(epoch)
    files = _state_files(epoch_dir)
    if "state.pkl" not in files or not any(
            f.startswith("state-") for f in files):
        raise ValueError(
            f"epoch {epoch}'s state snapshots were pruned "
            "(state_snapshot_retention) — savepoint a retained epoch")

    tmp = savepoint_dir + "._tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    for f in files:
        shutil.copyfile(os.path.join(epoch_dir, f), os.path.join(tmp, f))
    sp_manifest = {
        "epoch": epoch,
        "watermark_us": man["watermark_us"],
        "counters": man.get("counters", {}),
        "config_fp": man.get("config_fp"),
        "input_files": man.get("input_files"),
        "state_files": files,
        "source_out_dir": os.path.abspath(out_dir),
    }
    with open(os.path.join(tmp, _MANIFEST), "w") as f:
        json.dump(sp_manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    shutil.rmtree(savepoint_dir, ignore_errors=True)
    os.replace(tmp, savepoint_dir)
    return sp_manifest


def read_savepoint(savepoint_dir: str) -> dict:
    with open(os.path.join(savepoint_dir, _MANIFEST)) as f:
        return json.load(f)


def fork_from_savepoint(savepoint_dir: str, new_out_dir: str) -> dict:
    """Bootstrap ``new_out_dir`` from a savepoint: commit a
    metadata-only epoch carrying the savepoint's state files, watermark
    and config fingerprint (but no data outputs), so a subsequent
    ``resume=True`` run continues at epoch ``savepoint_epoch + 1``
    under the new directory's own lock and lineage.

    Refuses a ``new_out_dir`` that already has commits — a fork is a
    fresh lineage, not a merge.
    """
    sp = read_savepoint(savepoint_dir)
    sink = EpochSink(new_out_dir)
    if sink.committed_epochs():
        raise ValueError(
            f"{new_out_dir} already has committed epochs — fork into a "
            "fresh output dir")
    epoch = sp["epoch"]
    sink.acquire_lock()
    try:
        stage = sink.stage_path(epoch)
        os.makedirs(stage, exist_ok=True)
        for f in sp["state_files"]:
            shutil.copyfile(os.path.join(savepoint_dir, f),
                            os.path.join(stage, f))
        extra = {
            "savepoint": {
                "dir": os.path.abspath(savepoint_dir),
                "source_out_dir": sp.get("source_out_dir"),
            },
        }
        if sp.get("config_fp") is not None:
            extra["config_fp"] = sp["config_fp"]
        if sp.get("input_files") is not None:
            extra["input_files"] = sp["input_files"]
        manifest = sink.commit_epoch(
            epoch,
            watermark_us=sp["watermark_us"],
            counters=sp.get("counters", {}),
            extra=extra,
        )
    finally:
        sink.release_lock()
    return manifest
