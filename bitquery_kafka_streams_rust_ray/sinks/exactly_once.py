"""Exactly-once idempotent Parquet sink (S8; §2.9 "exactly-once").

The reference is at-least-once: it commits Kafka offsets *after*
processing, asynchronously, and even for poison messages
(``src/consumer.rs:156, 163-170``), leaning on dedup to mop up
duplicates. The north rule upgrades this to exactly-once, owned end to
end by the sink:

1. epoch output is written to ``<out>/_tmp/epoch={e}/`` (fresh dir,
   torn down first if a previous attempt crashed mid-write);
2. files are fsynced, then atomically renamed into
   ``<out>/epoch={e}/``;
3. a manifest ``<out>/_manifests/epoch-{e}.json`` is published last via
   write-to-temp + ``os.replace`` (atomic on POSIX). The manifest is
   the commit record: an epoch is **committed iff its manifest
   exists**.

Replaying a committed epoch is a no-op (``is_committed`` short-
circuits), so crash-and-resume produces each epoch's bytes exactly
once. Output layout is one directory per epoch (resumable, never one
giant file); a deterministic writer + pre-sorted rows make replayed
bytes identical.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


class EpochSink:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifests")
        self.tmp_root = os.path.join(out_dir, "_tmp")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.tmp_root, exist_ok=True)

    # --- run lock (consumer-group analog) -------------------------------
    # Kafka guarantees one consumer per partition per group; without an
    # equivalent, two drivers pointed at the same output dir would stage
    # into the same _tmp/epoch=N/ concurrently and the first commit
    # would rename a dir containing the other driver's torn files. The
    # lock is an O_EXCL-created pidfile: second drivers refuse loudly; a
    # lock whose pid is dead (crashed driver) is stale and taken over.

    def lock_path(self) -> str:
        return os.path.join(self.out_dir, "_lock")

    def acquire_lock(self) -> None:
        import errno

        for _ in range(2):  # at most one stale takeover
            try:
                fd = os.open(self.lock_path(),
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return
            except FileExistsError:
                try:
                    with open(self.lock_path()) as f:
                        holder = int(f.read().strip() or "0")
                except (OSError, ValueError):
                    holder = 0
                alive = False
                if holder > 0:
                    try:
                        os.kill(holder, 0)
                        alive = True
                    except OSError as e:
                        alive = e.errno == errno.EPERM
                # a live holder refuses — including our own pid: run()
                # releases in `finally`, so a live same-pid lock means
                # two pipelines in one process racing the same out dir
                if alive:
                    raise RuntimeError(
                        f"output dir {self.out_dir} is locked by a live "
                        f"run (pid {holder}) — one driver per output "
                        "dir, like one Kafka consumer per partition")
                os.unlink(self.lock_path())  # stale (or our own) — retake
        raise RuntimeError(f"could not acquire run lock in {self.out_dir}")

    def release_lock(self) -> None:
        try:
            os.unlink(self.lock_path())
        except FileNotFoundError:
            pass

    # --- commit protocol ----------------------------------------------
    def manifest_path(self, epoch: int) -> str:
        return os.path.join(self.manifest_dir, f"epoch-{epoch:06d}.json")

    def epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.out_dir, f"epoch={epoch:06d}")

    def is_committed(self, epoch: int) -> bool:
        return os.path.exists(self.manifest_path(epoch))

    def committed_epochs(self) -> list[int]:
        out = []
        for name in os.listdir(self.manifest_dir):
            if name.startswith("epoch-") and name.endswith(".json"):
                out.append(int(name[len("epoch-"):-len(".json")]))
        return sorted(out)

    def read_manifest(self, epoch: int) -> dict:
        with open(self.manifest_path(epoch)) as f:
            return json.load(f)

    def stage_path(self, epoch: int) -> str:
        """Path of an epoch's staging dir (no clearing — see stage_dir)."""
        return os.path.join(self.tmp_root, f"epoch={epoch:06d}")

    def stage_dir(self, epoch: int) -> str:
        """Fresh staging dir for one epoch attempt.

        Distributed stages write their per-shard output files directly
        into this directory *before* commit; a retried epoch starts by
        clearing any half-written previous attempt.
        """
        tmp_dir = os.path.join(self.tmp_root, f"epoch={epoch:06d}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir)
        return tmp_dir

    def commit_epoch(
        self,
        epoch: int,
        tables: dict[str, pa.Table] | None = None,
        watermark_us: int = 0,
        counters: dict[str, float] | None = None,
        blobs: dict[str, bytes] | None = None,
        extra: dict | None = None,
    ) -> dict:
        """Two-phase commit of one epoch's named outputs.

        ``tables`` maps output name (e.g. ``"tumbling_lang"``) to an
        already-deterministically-sorted Arrow table; ``blobs`` carries
        raw sidecar files (state snapshots). Files already staged into
        ``stage_dir(epoch)`` by distributed tasks are committed and
        inventoried too. Idempotent: a committed epoch returns its
        existing manifest untouched.
        """
        if self.is_committed(epoch):
            return self.read_manifest(epoch)

        tmp_dir = os.path.join(self.tmp_root, f"epoch={epoch:06d}")
        os.makedirs(tmp_dir, exist_ok=True)

        for name, table in (tables or {}).items():
            path = os.path.join(tmp_dir, f"{name}.parquet")
            pq.write_table(table, path)
            with open(path, "rb+") as f:
                os.fsync(f.fileno())
        for name, blob in (blobs or {}).items():
            path = os.path.join(tmp_dir, name)
            with open(path, "wb") as f:
                f.write(blob)
                f.flush()
                os.fsync(f.fileno())

        files = {}
        for name in sorted(os.listdir(tmp_dir)):
            entry = {"file": name}
            if name.endswith(".parquet"):
                entry["rows"] = pq.ParquetFile(os.path.join(tmp_dir, name)).metadata.num_rows
            files[name] = entry

        final_dir = self.epoch_dir(epoch)
        shutil.rmtree(final_dir, ignore_errors=True)  # uncommitted leftovers
        os.replace(tmp_dir, final_dir)

        manifest = {
            "epoch": epoch,
            "watermark_us": watermark_us,
            "outputs": files,
            "counters": counters or {},
        }
        if extra:
            manifest.update(extra)
        tmp_manifest = self.manifest_path(epoch) + ".tmp"
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp_manifest, self.manifest_path(epoch))
        return manifest

    def write_observability(self, epoch: int, files: dict[str, bytes]) -> str:
        """Write per-epoch telemetry (health report, Prometheus text)
        under ``<out>/_observability/epoch={e}/``.

        Deliberately OUTSIDE the 2PC commit and the byte-identity
        contract: telemetry carries wall-clock timings and timestamps,
        so identical reruns produce different bytes — data outputs must
        stay byte-identical, telemetry need not."""
        d = os.path.join(self.out_dir, "_observability", f"epoch={epoch:06d}")
        os.makedirs(d, exist_ok=True)
        for name, blob in files.items():
            with open(os.path.join(d, name), "wb") as f:
                f.write(blob)
        return d

    # --- reading back --------------------------------------------------
    def read_output(self, name: str, epochs: list[int] | None = None) -> pa.Table:
        """Concatenate one named output (exact or ``name-*`` sharded
        parquet files) across committed epochs, in epoch/shard order."""
        epochs = epochs if epochs is not None else self.committed_epochs()
        tables = []
        for e in epochs:
            d = self.epoch_dir(e)
            if not os.path.isdir(d):
                continue
            for fname in sorted(os.listdir(d)):
                if fname == f"{name}.parquet" or (
                    fname.startswith(f"{name}-") and fname.endswith(".parquet")
                ):
                    tables.append(pq.read_table(os.path.join(d, fname)))
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)
