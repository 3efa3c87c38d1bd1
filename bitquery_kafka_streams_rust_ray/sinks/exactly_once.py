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


class LockLostError(RuntimeError):
    """The run lock was stolen after our lease expired; this driver is
    fenced and must stop committing to the output directory."""


class EpochSink:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifests")
        self.tmp_root = os.path.join(out_dir, "_tmp")
        # staging namespace: unique per sink instance (see stage_path)
        self._stage_nonce = f"{os.getpid():x}-{os.urandom(4).hex()}"
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.tmp_root, exist_ok=True)

    # --- run lock (consumer-group analog) -------------------------------
    # Kafka guarantees one consumer per partition per group; without an
    # equivalent, two drivers pointed at the same output dir would stage
    # into the same _tmp/epoch=N/ concurrently and the first commit
    # would rename a dir containing the other driver's torn files.
    #
    # The lock is an O_EXCL-created file carrying a unique token plus
    # (host, pid). Staleness has two independent signals:
    #   * same host + dead pid  -> stale immediately (crashed driver);
    #   * lock mtime older than the lease -> stale regardless of host
    #     (covers remote holders, whose pids we cannot probe, and
    #     same-host pid reuse). Live runs heartbeat the mtime on every
    #     epoch commit (touch_lock), so the lease — default 1 h, knob
    #     ``lease_s`` — only needs to exceed the longest epoch.
    # Takeover is race-free twice over: contenders serialize the
    # judge-and-claim through a short-lived O_EXCL mutex file (so no
    # one judges a lock while another contender is mid-takeover), and
    # the claiming rename is verified against the exact bytes that were
    # judged stale (a stolen fresh lock is restored with a
    # never-clobbering os.link). Winners then race the O_EXCL create
    # fairly. release_lock unlinks only a lock that still carries our
    # token, so a holder that lost its lock can never delete a
    # successor's.

    def lock_path(self) -> str:
        return os.path.join(self.out_dir, "_lock")

    @staticmethod
    def _pid_alive(pid: int) -> bool:
        import errno

        try:
            os.kill(pid, 0)
            return True
        except OSError as e:
            return e.errno == errno.EPERM

    @staticmethod
    def _parse_lock(raw: bytes | None) -> dict | None:
        """Parse lock bytes: JSON, or a legacy bare-pid string
        (treated as a same-host holder). None if unreadable/garbled."""
        import socket

        if raw is None:
            return None
        text = raw.decode(errors="replace").strip()
        try:
            info = json.loads(text)
            if isinstance(info, dict) and "token" in info:
                return info
        except ValueError:
            pass
        try:
            return {"token": text, "host": socket.gethostname(),
                    "pid": int(text or "0")}
        except ValueError:
            return None

    def _read_lock(self) -> dict | None:
        try:
            with open(self.lock_path(), "rb") as f:
                return self._parse_lock(f.read())
        except OSError:
            return None

    def acquire_lock(self, lease_s: float = 3600.0) -> None:
        import socket
        import time

        host = socket.gethostname()
        token = f"{host}:{os.getpid()}:{os.urandom(8).hex()}"
        payload = json.dumps(
            {"token": token, "host": host, "pid": os.getpid()}).encode()

        deadline = time.monotonic() + 30.0
        while time.monotonic() < deadline:  # create / takeover attempts
            try:
                fd = os.open(self.lock_path(),
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, payload)
                os.close(fd)
                self._lock_token = token
                self._fenced = False  # fresh lease: fence lifts
                self._sweep_stale_staging()
                return
            except FileExistsError:
                pass
            # Takeover is serialized by a short-lived mutex file, so no
            # two contenders judge-and-claim concurrently: the race
            # where B judges the old lock stale, A completes takeover
            # and writes a FRESH lock, and B's rename then steals A's
            # live lock cannot start inside the mutex.
            mutex = self.lock_path() + ".takeover"
            try:
                mfd = os.open(mutex, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(mfd)
            except FileExistsError:
                # mutex held — or orphaned by a contender that died
                # mid-takeover (its critical section is a few syscalls,
                # so anything older than 10 s is a corpse)
                try:
                    if time.time() - os.stat(mutex).st_mtime > 10.0:
                        os.unlink(mutex)
                except OSError:
                    pass
                time.sleep(0.005)
                continue
            try:
                self._takeover_stale_lock(lease_s, host)
            finally:
                try:
                    os.unlink(mutex)
                except OSError:
                    pass
            # loop back to the O_EXCL create — all creators race it
            # fairly, exactly one wins
        raise RuntimeError(f"could not acquire run lock in {self.out_dir}")

    def _takeover_stale_lock(self, lease_s: float, host: str) -> None:
        """Judge the current lock file and, iff stale, remove it.

        Runs under the takeover mutex. Judgment and claim operate on a
        single raw read; after the claiming rename we verify the bytes
        we claimed are the bytes we judged — if a live owner released
        and a new winner created in between, we restore the stolen
        fresh lock with a never-clobbering os.link and walk away.
        Raises the live-holder refusal; returns silently otherwise (the
        caller retries the O_EXCL create)."""
        import time

        try:
            with open(self.lock_path(), "rb") as f:
                judged_raw = f.read()
            age = time.time() - os.stat(self.lock_path()).st_mtime
        except OSError:
            return  # vanished — retry create
        info = self._parse_lock(judged_raw)
        if info is None:
            stale = True  # torn/garbled write: no live writer does this
        elif info.get("host") == host and info.get("pid", 0) > 0 \
                and not self._pid_alive(info["pid"]):
            stale = True  # crashed driver on this host
        else:
            stale = age > lease_s  # remote holder / pid reuse: lease
        if not stale:
            # a live holder refuses — including our own pid: run()
            # releases in `finally`, so a live same-pid lock means
            # two pipelines in one process racing the same out dir
            raise RuntimeError(
                f"output dir {self.out_dir} is locked by a live "
                f"run ({info.get('host')}:{info.get('pid')}) — one "
                "driver per output dir, like one Kafka consumer "
                "per partition")
        # claim the stale file: exactly one racer wins this rename
        claimed = self.lock_path() + ".stale." + os.urandom(4).hex()
        try:
            os.rename(self.lock_path(), claimed)
        except FileNotFoundError:
            return  # released/claimed in the judge→rename window
        try:
            with open(claimed, "rb") as f:
                claimed_raw = f.read()
        except OSError:
            claimed_raw = None
        if claimed_raw != judged_raw:
            # we renamed a lock that is NOT the one we judged stale —
            # a successor's fresh lease. Put it back atomically; link
            # fails (never clobbers) if yet another racer created one,
            # in which case heartbeat fencing protects the dispossessed
            # holder and we simply stand down.
            try:
                os.link(claimed, self.lock_path())
            except OSError:
                pass
        try:
            os.unlink(claimed)
        except FileNotFoundError:
            pass

    def _sweep_stale_staging(self) -> None:
        """Remove staging dirs left by other (dead or fenced) sink
        instances. Safe exactly because we hold the run lock: any
        process still writing to a foreign-nonce dir has, by
        definition, lost the lock, and its commit would be fenced."""
        suffix = "." + self._stage_nonce
        try:
            entries = os.listdir(self.tmp_root)
        except OSError:
            return
        for name in entries:
            if not name.endswith(suffix):
                shutil.rmtree(os.path.join(self.tmp_root, name),
                              ignore_errors=True)

    def touch_lock(self) -> None:
        """Heartbeat + fence: refresh the lease mtime of a lock we
        still own.

        Re-reads the lock first and raises ``LockLostError`` if it no
        longer carries our token — the fencing that stops a
        live-but-slow original driver (an epoch longer than the lease,
        so no heartbeat fired) from committing after a contender's
        stale takeover. ``commit_epoch`` calls this before any write,
        so a fenced driver fails its commit instead of interleaving
        output with the new owner.
        """
        if getattr(self, "_fenced", False):
            raise LockLostError(
                f"run lock for {self.out_dir} was lost earlier; this "
                "driver stays fenced")
        token = getattr(self, "_lock_token", None)
        if token is None:
            return
        info = self._read_lock()
        if info is None or info.get("token") != token:
            self._lock_token = None  # not ours anymore — never unlink it
            self._fenced = True      # sticky: later commits stay refused
            raise LockLostError(
                f"run lock for {self.out_dir} was taken over by "
                f"{(info or {}).get('host')}:{(info or {}).get('pid')} — "
                "this driver exceeded its lease and is fenced")
        try:
            os.utime(self.lock_path())
        except OSError:
            pass  # benign: next heartbeat re-verifies ownership anyway

    def release_lock(self) -> None:
        token = getattr(self, "_lock_token", None)
        self._lock_token = None
        if token is None:
            return  # never acquired / double release: nothing is ours
        info = self._read_lock()
        if info is not None and info.get("token") != token:
            return  # lock was taken over; it is not ours to delete
        try:
            os.unlink(self.lock_path())
        except FileNotFoundError:
            pass

    # --- checkpoint retention -----------------------------------------
    def prune_state_snapshots(self, keep_last: int,
                              start_epoch: int = 0) -> tuple[int, int]:
        """Delete per-shard state checkpoint files (``state-*.pkl`` and
        their ``.dedup.sqlite`` sidecars) from committed epochs older
        than the last ``keep_last``.

        Resume only ever restores from the LAST committed epoch, so at
        production epoch counts the older snapshots are a pure storage
        cost that grows as epochs x state size — on a 10^12-row run the
        dedup B-trees alone dwarf the data outputs. Data files,
        manifests, and the tiny ``state.pkl`` metadata blob stay, so
        time-travel reads of committed outputs are unaffected. A
        post-commit lifecycle action exactly like compaction's source
        cleanup: the manifest inventory remains the record of what was
        COMMITTED. Idempotent. Returns ``(files_removed, cursor)``
        where ``cursor`` is the first epoch still holding snapshots —
        pass it back as ``start_epoch`` to keep the per-commit scan
        O(new epochs), not O(all epochs).
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1 — the last "
                             "committed epoch's snapshot is the resume "
                             "point and is never prunable")
        committed = self.committed_epochs()
        prunable = committed[:-keep_last]
        removed = 0
        for e in prunable:
            if e < start_epoch:
                continue
            d = self.epoch_dir(e)
            if not os.path.isdir(d):
                continue
            for fname in sorted(os.listdir(d)):
                if fname.startswith("state-") and (
                        fname.endswith(".pkl")
                        or fname.endswith(".dedup.sqlite")):
                    os.remove(os.path.join(d, fname))
                    removed += 1
        cursor = committed[-keep_last] if len(committed) >= keep_last \
            else start_epoch
        return removed, cursor

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
        """Path of an epoch's staging dir (no clearing — see stage_dir).

        Staging is namespaced by a per-sink-instance nonce so two
        driver processes pointed at the same output dir can NEVER
        share a staging dir: a fenced-but-live old driver's late shard
        writes land in its own orphaned dir instead of polluting the
        new lock owner's in-progress staging (whose commit inventories
        ``os.listdir`` of this dir). The manifest commit — fenced by
        ``touch_lock`` — stays the single arbitration point.
        """
        return os.path.join(self.tmp_root,
                            f"epoch={epoch:06d}.{self._stage_nonce}")

    def stage_dir(self, epoch: int) -> str:
        """Fresh staging dir for one epoch attempt.

        Distributed stages write their per-shard output files directly
        into this directory *before* commit; a retried epoch starts by
        clearing any half-written previous attempt. Fenced: a driver
        that lost its lease raises here, before any staging I/O.
        """
        self.touch_lock()
        tmp_dir = self.stage_path(epoch)
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
        self.touch_lock()  # lease heartbeat + fence: one per epoch commit
        if self.is_committed(epoch):
            return self.read_manifest(epoch)

        tmp_dir = self.stage_path(epoch)
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
