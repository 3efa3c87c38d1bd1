"""Small-file compaction for committed epoch outputs.

A streaming sink that commits every epoch necessarily produces many
small files (one per epoch x state shard); at 100 TB that becomes a
metadata problem for whatever reads the output next. Compaction merges
one named output's files across committed epochs into fewer files of
bounded size, preserving exact row order (epoch asc, shard asc, row
order within file) and the sink's exactly-once discipline:

1. the driver bins the (epoch, file) inventory — manifest metadata
   only, no data — into contiguous groups of ~``target_bytes``;
2. each bin merges in its own Ray worker task: read members, concat,
   write to ``<out>/_compact_tmp/``, fsync (data never flows through
   the driver);
3. merged files move atomically into ``<out>/compacted/gen={g}/``, and
   a compaction manifest ``_manifests/compact-{g:06d}.json`` publishes
   last via write-temp + ``os.replace`` — compaction is visible iff its
   manifest exists;
4. source files are deleted only AFTER the manifest is durable; a
   crash in between leaves both copies and the next ``compact_output``
   (or any reader) finishes the cleanup — readers always prefer the
   compacted generation for epochs a manifest covers.

Run it after a drained (finished) run — the resume guard already
refuses to resume a drained output over changed input, so removing
per-epoch files cannot break mid-stream recovery.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .exactly_once import EpochSink


@ray.remote
def _merge_bin(paths: list[str], out_path: str) -> dict:
    """Merge member parquet files (in order) into one file; fsync."""
    table = pa.concat_tables([pq.read_table(p) for p in paths])
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pq.write_table(table, out_path)
    with open(out_path, "rb+") as f:
        os.fsync(f.fileno())
    return {"rows": table.num_rows, "bytes": os.path.getsize(out_path)}


def _compaction_manifests(sink: EpochSink) -> list[dict]:
    out = []
    for name in sorted(os.listdir(sink.manifest_dir)):
        if name.startswith("compact-") and name.endswith(".json"):
            with open(os.path.join(sink.manifest_dir, name)) as f:
                out.append(json.load(f))
    return out


def _covered(sink: EpochSink, output: str) -> set[tuple[int, str]]:
    """(epoch, file) pairs already folded into some compacted generation."""
    done: set[tuple[int, str]] = set()
    for m in _compaction_manifests(sink):
        if m["output"] != output:
            continue
        for bin_ in m["bins"]:
            done.update((s["epoch"], s["file"]) for s in bin_["sources"])
    return done


def _cleanup_sources(sink: EpochSink, manifest: dict) -> None:
    """Delete source files a durable compaction manifest covers
    (idempotent — missing files were already cleaned)."""
    for bin_ in manifest["bins"]:
        for src in bin_["sources"]:
            p = os.path.join(sink.epoch_dir(src["epoch"]), src["file"])
            if os.path.exists(p):
                os.remove(p)


def compact_output(
    sink: EpochSink,
    output: str,
    target_bytes: int = 128 << 20,
) -> dict | None:
    """Compact one named output across all committed epochs.

    Returns the published compaction manifest, or ``None`` when there
    is nothing to do (fewer than two uncompacted files). Idempotent:
    re-running first finishes any interrupted cleanup, then compacts
    only files no earlier generation covers.
    """
    # finish interrupted cleanups from prior generations first
    for m in _compaction_manifests(sink):
        if m["output"] == output:
            _cleanup_sources(sink, m)

    done = _covered(sink, output)
    inventory: list[tuple[int, str, str, int]] = []  # epoch, file, path, bytes
    for e in sink.committed_epochs():
        d = sink.epoch_dir(e)
        if not os.path.isdir(d):
            continue
        for fname in sorted(os.listdir(d)):
            is_member = fname == f"{output}.parquet" or (
                fname.startswith(f"{output}-") and fname.endswith(".parquet")
            )
            if is_member and (e, fname) not in done:
                p = os.path.join(d, fname)
                inventory.append((e, fname, p, os.path.getsize(p)))
    if len(inventory) < 2:
        return None

    gen = len([m for m in _compaction_manifests(sink)
               if m["output"] == output])
    tmp_dir = os.path.join(sink.out_dir, "_compact_tmp",
                           f"{output}-gen={gen:06d}")
    shutil.rmtree(tmp_dir, ignore_errors=True)

    # contiguous bins of ~target_bytes, preserving (epoch, shard) order
    bins: list[list[tuple[int, str, str, int]]] = [[]]
    acc = 0
    for item in inventory:
        if bins[-1] and acc + item[3] > target_bytes:
            bins.append([])
            acc = 0
        bins[-1].append(item)
        acc += item[3]

    refs = []
    for i, bin_ in enumerate(bins):
        out_path = os.path.join(tmp_dir, f"{output}-c{i:05d}.parquet")
        refs.append(_merge_bin.remote([p for _, _, p, _ in bin_], out_path))
    stats = ray.get(refs)

    final_dir = os.path.join(sink.out_dir, "compacted",
                             f"{output}-gen={gen:06d}")
    shutil.rmtree(final_dir, ignore_errors=True)
    os.makedirs(os.path.dirname(final_dir), exist_ok=True)
    os.replace(tmp_dir, final_dir)

    manifest = {
        "output": output,
        "generation": gen,
        "dir": os.path.relpath(final_dir, sink.out_dir),
        "bins": [
            {
                "file": f"{output}-c{i:05d}.parquet",
                "rows": stats[i]["rows"],
                "bytes": stats[i]["bytes"],
                "sources": [{"epoch": e, "file": f} for e, f, _, _ in bin_],
            }
            for i, bin_ in enumerate(bins)
        ],
    }
    mpath = os.path.join(sink.manifest_dir, f"compact-{output}-{gen:06d}.json")
    tmp_manifest = mpath + ".tmp"
    with open(tmp_manifest, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_manifest, mpath)

    # durable manifest first, then drop the small files it replaced
    _cleanup_sources(sink, manifest)
    return manifest


def compact_all(sink: EpochSink, target_bytes: int = 128 << 20) -> dict:
    """Compact every parquet output named in the committed manifests.

    Base names derive from the manifest inventory: ``pages-0003.parquet``
    and ``pages.parquet`` both belong to output ``pages`` (the same
    matching rule readers use). Returns {output: manifest-or-None}."""
    import re

    names: set[str] = set()
    for e in sink.committed_epochs():
        for fname in sink.read_manifest(e).get("outputs", {}):
            if not fname.endswith(".parquet"):
                continue
            stem = fname[: -len(".parquet")]
            m = re.match(r"^(.*)-(\d+)$", stem)
            names.add(m.group(1) if m else stem)
    return {n: compact_output(sink, n, target_bytes) for n in sorted(names)}


def read_output_compacted(sink: EpochSink, output: str) -> pa.Table:
    """Read one named output across compacted generations + any epochs
    not yet compacted, preserving the original (epoch, shard) row order.

    Compacted generations cover strictly increasing (epoch, file)
    prefixes of the inventory (compaction bins contiguously in order),
    so generation order followed by remaining epoch order reproduces
    the uncompacted concatenation byte for byte.
    """
    tables = []
    covered: set[tuple[int, str]] = set()
    for m in sorted(_compaction_manifests(sink),
                    key=lambda m: m["generation"]):
        if m["output"] != output:
            continue
        gen_dir = os.path.join(sink.out_dir, m["dir"])
        for bin_ in m["bins"]:
            tables.append(pq.read_table(os.path.join(gen_dir, bin_["file"])))
            covered.update((s["epoch"], s["file"]) for s in bin_["sources"])
    for e in sink.committed_epochs():
        d = sink.epoch_dir(e)
        if not os.path.isdir(d):
            continue
        for fname in sorted(os.listdir(d)):
            is_member = fname == f"{output}.parquet" or (
                fname.startswith(f"{output}-") and fname.endswith(".parquet")
            )
            if is_member and (e, fname) not in covered:
                tables.append(pq.read_table(os.path.join(d, fname)))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)
