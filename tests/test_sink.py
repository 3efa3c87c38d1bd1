"""Exactly-once sink: 2PC, idempotency, staged files, manifests."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink


def table(n=3):
    return pa.table({"a": list(range(n)), "b": ["x"] * n})


def test_commit_and_read(tmp_path):
    sink = EpochSink(str(tmp_path / "out"))
    m = sink.commit_epoch(0, tables={"t": table()}, watermark_us=123,
                          counters={"rows_written": 3})
    assert sink.is_committed(0)
    assert m["watermark_us"] == 123
    assert m["outputs"]["t.parquet"]["rows"] == 3
    assert sink.read_output("t").num_rows == 3


def test_commit_idempotent(tmp_path):
    sink = EpochSink(str(tmp_path / "out"))
    m1 = sink.commit_epoch(1, tables={"t": table(2)}, watermark_us=1)
    # replay with DIFFERENT data must be a no-op returning the original
    m2 = sink.commit_epoch(1, tables={"t": table(5)}, watermark_us=99)
    assert m2 == m1
    assert sink.read_output("t").num_rows == 2


def test_staged_task_files_committed(tmp_path):
    sink = EpochSink(str(tmp_path / "out"))
    stage = sink.stage_dir(2)
    pq.write_table(table(4), os.path.join(stage, "pages-0001.parquet"))
    m = sink.commit_epoch(2, tables={"w": table(1)}, watermark_us=5)
    assert m["outputs"]["pages-0001.parquet"]["rows"] == 4
    assert sink.read_output("pages").num_rows == 4
    assert sink.read_output("w").num_rows == 1


def test_stage_dir_clears_previous_attempt(tmp_path):
    sink = EpochSink(str(tmp_path / "out"))
    stage = sink.stage_dir(3)
    pq.write_table(table(9), os.path.join(stage, "leftover.parquet"))
    stage2 = sink.stage_dir(3)  # retry of the same epoch
    assert stage2 == stage
    assert os.listdir(stage2) == []


def test_committed_epochs_and_blobs(tmp_path):
    sink = EpochSink(str(tmp_path / "out"))
    sink.commit_epoch(0, tables={"t": table()}, blobs={"state.pkl": b"snap"})
    sink.commit_epoch(1, tables={"t": table()})
    assert sink.committed_epochs() == [0, 1]
    with open(os.path.join(sink.epoch_dir(0), "state.pkl"), "rb") as f:
        assert f.read() == b"snap"


def test_manifest_is_valid_json_and_atomic(tmp_path):
    sink = EpochSink(str(tmp_path / "out"))
    sink.commit_epoch(7, tables={"t": table()}, counters={"c": 1})
    with open(sink.manifest_path(7)) as f:
        m = json.load(f)
    assert m["epoch"] == 7 and m["counters"] == {"c": 1}
    assert not os.path.exists(sink.manifest_path(7) + ".tmp")


def test_run_lock_excludes_second_driver(tmp_path):
    """Consumer-group analog: one driver per output dir. A live lock
    refuses a second acquire; a stale lock (dead pid) is taken over."""
    import pytest

    from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink

    out = str(tmp_path / "locked_out")
    a, b = EpochSink(out), EpochSink(out)
    a.acquire_lock()
    with pytest.raises(RuntimeError, match="locked by a live run"):
        b.acquire_lock()
    a.release_lock()
    b.acquire_lock()  # free again
    b.release_lock()

    # stale lock: a pid that no longer exists is taken over silently
    with open(a.lock_path(), "w") as f:
        f.write("999999999")
    b.acquire_lock()
    b.release_lock()


def test_run_lock_release_only_unlinks_own_token(tmp_path):
    """A holder that lost its lock (stale takeover by another driver)
    must not delete the successor's live lock on release."""
    out = str(tmp_path / "tok_out")
    a, b = EpochSink(out), EpochSink(out)
    a.acquire_lock()
    # simulate a's death + takeover: b claims after a's pid "dies"
    with open(a.lock_path(), "w") as f:
        f.write("999999999")  # legacy stale pid overwrites a's token
    b.acquire_lock()
    a.release_lock()  # a's token no longer in the file -> no-op
    assert os.path.exists(b.lock_path())
    info = json.loads(open(b.lock_path()).read())
    assert info["token"] == b._lock_token
    b.release_lock()
    assert not os.path.exists(b.lock_path())


def test_run_lock_lease_expiry_takes_over_remote_holder(tmp_path):
    """A lock from an unknown host can't be pid-probed; it is stale
    only once its mtime exceeds the lease (heartbeat refreshes it)."""
    import pytest

    out = str(tmp_path / "lease_out")
    sink = EpochSink(out)
    with open(sink.lock_path(), "w") as f:
        json.dump({"token": "x", "host": "other-host", "pid": 1}, f)
    # fresh mtime: treated as live regardless of pid
    with pytest.raises(RuntimeError, match="locked by a live run"):
        sink.acquire_lock(lease_s=3600.0)
    # age the lock past the lease -> taken over
    os.utime(sink.lock_path(), (0, 0))
    sink.acquire_lock(lease_s=3600.0)
    assert json.loads(open(sink.lock_path()).read())["host"] != "other-host"
    sink.release_lock()


def test_run_lock_heartbeat_refreshes_lease(tmp_path):
    out = str(tmp_path / "hb_out")
    sink = EpochSink(out)
    sink.acquire_lock()
    os.utime(sink.lock_path(), (0, 0))
    sink.commit_epoch(0, tables={"t": table()})  # commit heartbeats
    assert os.stat(sink.lock_path()).st_mtime > 1.0
    sink.release_lock()


def test_run_lock_takeover_race_single_winner(tmp_path):
    """Two contenders deciding 'stale' concurrently: the rename claim
    admits exactly one; the loser re-evaluates the fresh lock and
    refuses."""
    import pytest

    out = str(tmp_path / "race_out")
    a, b = EpochSink(out), EpochSink(out)
    with open(a.lock_path(), "w") as f:
        f.write("999999999")  # stale
    a.acquire_lock()  # a wins the claim
    with pytest.raises(RuntimeError, match="locked by a live run"):
        b.acquire_lock()  # b now sees a's live lock, not the stale one
    a.release_lock()


def _contend_for_lock(out_dir, q):
    """Module-level so the spawn context can pickle it."""
    from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink

    s = EpochSink(out_dir)
    try:
        s.acquire_lock()
        q.put(("won", s._lock_token))
    except RuntimeError as e:
        q.put(("refused", str(e)[:40]))
    except Exception as e:  # pragma: no cover - the failure signal
        q.put(("crashed", repr(e)))


def test_run_lock_multiprocess_takeover_race(tmp_path):
    """Real contention: 8 processes race to take over the same stale
    lock simultaneously; exactly one must acquire, the rest must see a
    live-run refusal (never a crash, never two winners)."""
    import multiprocessing as mp

    out = str(tmp_path / "mp_out")
    sink = EpochSink(out)
    with open(sink.lock_path(), "w") as f:
        f.write("999999999")  # stale legacy lock

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_contend_for_lock, args=(out, q))
             for _ in range(8)]
    for p in procs:
        p.start()
    results = [q.get(timeout=60) for _ in procs]
    for p in procs:
        p.join(timeout=60)

    outcomes = [r[0] for r in results]
    assert outcomes.count("won") == 1, results
    assert outcomes.count("crashed") == 0, results
    # the winner's token is what the lock file holds
    winner_token = next(r[1] for r in results if r[0] == "won")
    info = json.loads(open(sink.lock_path()).read())
    assert info["token"] == winner_token


def test_takeover_restores_stolen_fresh_lock(tmp_path, monkeypatch):
    """The judge→rename window: B judges the legacy lock stale, but
    winner A completes takeover first and writes a FRESH lock at the
    same path. B's claiming rename then grabs A's live lock — the
    post-rename byte verification must detect the mismatch, restore
    A's lock atomically, and make B refuse."""
    import pytest

    out = str(tmp_path / "steal_out")
    b = EpochSink(out)
    with open(b.lock_path(), "w") as f:
        f.write("999999999")  # stale legacy lock

    fresh = json.dumps(
        {"token": "winner-A", "host": "elsewhere", "pid": 1}).encode()
    real_rename = os.rename

    def racing_rename(src, dst):
        # A finishes its takeover between B's judgment and B's claim
        if src == b.lock_path():
            with open(src, "wb") as f:
                f.write(fresh)
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", racing_rename)
    with pytest.raises(RuntimeError, match="locked by a live run"):
        b.acquire_lock()
    # A's fresh lock was restored byte-identically, not destroyed
    assert open(b.lock_path(), "rb").read() == fresh


def test_touch_lock_fences_stolen_lease(tmp_path):
    """ADVICE fix: a live-but-slow driver whose lease expired must be
    FENCED once a contender steals the lock — touch_lock (and through
    it commit_epoch) re-verifies token ownership and raises instead of
    utiming the successor's lock and interleaving commits."""
    import pytest

    from bitquery_kafka_streams_rust_ray.sinks.exactly_once import (
        EpochSink, LockLostError)

    out = str(tmp_path / "fence_out")
    a, b = EpochSink(out), EpochSink(out)
    a.acquire_lock(lease_s=3600.0)
    a.touch_lock()  # still ours: heartbeat succeeds

    # a stalls past its lease; b steals the stale lock
    os.utime(a.lock_path(), (0, 0))
    b.acquire_lock(lease_s=3600.0)

    # a wakes up and tries to commit: fenced at the heartbeat
    with pytest.raises(LockLostError, match="fenced"):
        a.touch_lock()
    with pytest.raises(LockLostError):
        a.commit_epoch(0, tables={"t": table()})
    # fencing must not have refreshed or deleted b's lock
    info = json.loads(open(b.lock_path()).read())
    assert info["token"] == b._lock_token
    # and a's release after fencing is a no-op on b's lock
    a.release_lock()
    assert os.path.exists(b.lock_path())
    b.commit_epoch(0, tables={"t": table()})  # the new owner commits fine
    b.release_lock()


def test_release_lock_without_token_never_unlinks(tmp_path):
    """ADVICE fix: release with no token (double release / never
    acquired) must return early, not fall through and unlink another
    driver's live lock."""
    out = str(tmp_path / "norel_out")
    a, b = EpochSink(out), EpochSink(out)
    b.acquire_lock()
    a.release_lock()  # a never acquired: must not touch b's lock
    assert os.path.exists(b.lock_path())
    b.release_lock()
    assert not os.path.exists(b.lock_path())
    b.release_lock()  # double release: early return, no crash


def test_stale_takeover_staging_is_isolated(tmp_path):
    """The reviewer scenario for lease takeover: a fenced-but-live old
    driver must not be able to rmtree or pollute the new owner's
    in-progress staging. Staging dirs are nonce-namespaced per sink
    instance, stage_dir() itself is fenced, and the new owner's
    acquire sweeps the loser's leftovers."""
    import pytest

    from bitquery_kafka_streams_rust_ray.sinks.exactly_once import (
        EpochSink, LockLostError)

    out = str(tmp_path / "stage_iso")
    a, b = EpochSink(out), EpochSink(out)
    a.acquire_lock(lease_s=3600.0)
    stage_a = a.stage_dir(0)
    with open(os.path.join(stage_a, "pages-0000.parquet"), "wb") as f:
        f.write(b"a-bytes")

    # a stalls past its lease; b steals and stages the same epoch
    os.utime(a.lock_path(), (0, 0))
    b.acquire_lock(lease_s=3600.0)
    assert not os.path.exists(stage_a)  # owner sweep removed a's orphan
    stage_b = b.stage_dir(0)
    assert stage_b != stage_a  # disjoint namespaces by construction
    pq.write_table(table(), os.path.join(stage_b, "pages-0000.parquet"))

    # a wakes mid-epoch: staging is fenced before any rmtree happens
    with pytest.raises(LockLostError):
        a.stage_dir(0)
    assert os.path.exists(os.path.join(stage_b, "pages-0000.parquet"))

    # and even a's shard tasks writing to a's OWN pre-fence path can't
    # reach b's staging (different dir), so b commits exactly its files
    m = b.commit_epoch(0)
    assert list(m["outputs"]) == ["pages-0000.parquet"]
    b.release_lock()
