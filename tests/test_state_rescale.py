"""Rescaling checkpointed shard state across a different shard count:
splitting is owner-exact, merging is lossless, and the union of
emissions from the rescaled shards equals the original's."""

import os

import numpy as np
import pytest

from bitquery_kafka_streams_rust_ray.stages.hashing import shard_of
from bitquery_kafka_streams_rust_ray.state.rescale import (
    build_dedup, merge_fragments, split_snapshot)
from bitquery_kafka_streams_rust_ray.state.store import (
    DedupState, DistinctWindowState, FunnelState, SessionState,
    SpillDedupState, TopKState, WindowState)

US = 1_000_000
KEYS = [f"host{i}.example.com/p{j}" for i in range(17) for j in range(5)]


def _full_snapshot(dedup_snap):
    """Assemble a StateShard-format snapshot around a dedup snapshot."""
    win = WindowState(update_horizon_us=60 * US)
    ends = np.array([100 * US, 200 * US], dtype=np.int64)
    for i, k in enumerate(KEYS):
        win.add_partials("tumbling:lang", [k],
                         np.array([(i % 2) * 100 * US]),
                         ends[[i % 2]],
                         np.array([i + 1]), np.array([float(i) * 2]))
    win.close(150 * US)  # retains closed windows (update mode)
    win.add_partials("tumbling:lang", [KEYS[0]], np.array([0]),
                     np.array([100 * US]), np.array([5]), np.array([9.0]))

    # update-mode session state with all three populations: open
    # sessions, retained emissions, and reopened sessions carrying
    # pending retracts (split/merge must preserve each)
    sess = SessionState(30 * US, update_horizon_us=100_000 * US)
    sess.add(KEYS, np.arange(len(KEYS), dtype=np.int64) * US,
             np.ones(len(KEYS)))
    sess.close(40 * US)  # keys with ts < 10s emit and are retained
    sess.add(KEYS[:5], (np.arange(5, dtype=np.int64) + 20) * US,
             np.ones(5))  # within gap of the retained -> reopened

    fun = FunnelState(2, 600 * US)
    fun.add(KEYS[:20], np.zeros(20, dtype=np.int64),
            np.arange(20, dtype=np.int64) * US)
    fun.add(KEYS[:10], np.ones(10, dtype=np.int64),
            (np.arange(10, dtype=np.int64) + 30) * US)

    topk = TopKState(5)
    topk.add(KEYS, np.arange(len(KEYS), dtype=np.int64) + 1)

    dist = DistinctWindowState(p=8)
    regs = np.zeros(256, dtype=np.uint8)
    regs[3] = 7
    dist.add_partials(KEYS[:6], np.zeros(6, dtype=np.int64),
                      np.full(6, 100 * US, dtype=np.int64),
                      [regs.tobytes()] * 6, [["a", "b"]] * 6)

    return {"dedup": dedup_snap, "windows": win.snapshot(),
            "sessions": sess.snapshot(), "funnel": fun.snapshot(),
            "topk": topk.snapshot(), "distinct": dist.snapshot()}, win, sess


def test_split_routes_every_key_to_its_new_owner(tmp_path):
    st = DedupState(60 * US)
    st.process(KEYS, np.arange(len(KEYS), dtype=np.int64) * US)
    snap, _, _ = _full_snapshot(st.snapshot())
    frags = split_snapshot(snap, 5, None, str(tmp_path), 0)
    assert len(frags) == 5
    for j, f in enumerate(frags):
        for key in f["dedup"]["last_seen"]:
            assert shard_of([key], 5)[0] == j
        for row in f["windows"]["acc"]:
            assert shard_of([row[0][1]], 5)[0] == j
        for key in f["sessions"]["sessions"]:
            assert shard_of([key], 5)[0] == j
        for key in f["funnel"]["chains"]:
            assert shard_of([key], 5)[0] == j
        for key in f["topk"]["counts"]:
            assert shard_of([key], 5)[0] == j
        for row in f["distinct"]["rows"]:
            assert shard_of([row[0]], 5)[0] == j


def test_split_then_merge_is_lossless(tmp_path):
    st = DedupState(60 * US)
    st.process(KEYS, np.arange(len(KEYS), dtype=np.int64) * US)
    snap, win, sess = _full_snapshot(st.snapshot())
    frags = split_snapshot(snap, 3, None, str(tmp_path), 0)

    # merge ALL fragments back (the K'=1 degenerate) — must equal the
    # original component state behaviorally
    merged = merge_fragments(frags)
    rwin = WindowState.restore(merged["windows"], 60 * US)
    assert rwin.close(10_000 * US) == win.close(10_000 * US)
    assert rwin.pop_updates(0) == win.pop_updates(0)
    rsess = SessionState.restore(merged["sessions"])
    assert rsess.close(10_000 * US) == sess.close(10_000 * US)
    assert rsess.pop_updates() == sess.pop_updates()
    assert rsess.closed == sess.closed
    rded = build_dedup([f["dedup"] for f in frags], None)
    assert rded.last_seen == st.last_seen
    rtop = TopKState.restore(merged["topk"])
    assert sorted(rtop.counts.items()) == sorted(
        TopKState.restore(snap["topk"]).counts.items())
    rfun = FunnelState.restore(merged["funnel"])
    ofun = FunnelState.restore(snap["funnel"])
    assert rfun.close(10_000 * US) == ofun.close(10_000 * US)
    rdist = DistinctWindowState.restore(merged["distinct"])
    odist = DistinctWindowState.restore(snap["distinct"])
    assert rdist.close(10_000 * US) == odist.close(10_000 * US)


def test_union_of_rescaled_emissions_equals_original(tmp_path):
    """The property the engine relies on: close() over the K' rescaled
    shards, unioned, equals the single original shard's close()."""
    st = DedupState(60 * US)
    st.process(KEYS, np.arange(len(KEYS), dtype=np.int64) * US)
    snap, win, sess = _full_snapshot(st.snapshot())
    frags = split_snapshot(snap, 4, None, str(tmp_path), 0)

    wm = 10_000 * US
    got_windows, got_sessions, got_sess_upd, got_funnels = [], [], [], []
    for f in frags:
        w = WindowState.restore(f["windows"], 60 * US)
        got_windows.extend(w.close(wm))
        rs = SessionState.restore(f["sessions"])
        got_sessions.extend(rs.close(wm))
        got_sess_upd.extend(rs.pop_updates())
        got_funnels.extend(FunnelState.restore(f["funnel"]).close(wm))
    assert sorted(got_windows) == win.close(wm)
    assert sorted(got_sessions) == sess.close(wm)
    assert sorted(got_sess_upd) == sess.pop_updates()
    assert sorted(got_funnels) == FunnelState.restore(
        snap["funnel"]).close(wm)


@pytest.mark.parametrize("sidecar", [False, True])
def test_spill_dedup_splits_and_merges_streamed(tmp_path, sidecar):
    db = str(tmp_path / "src.sqlite")
    st = SpillDedupState(60 * US, db)
    ts = np.arange(len(KEYS), dtype=np.int64) * US
    st.process(KEYS, ts)
    if sidecar:
        side = str(tmp_path / "ckpt" / "state-0000.pkl.dedup.sqlite")
        os.makedirs(os.path.dirname(side))
        dsnap = st.snapshot_to_file(side)
        sidecar_dir = os.path.dirname(side)
    else:
        dsnap = st.snapshot()
        sidecar_dir = None
    snap, _, _ = _full_snapshot(dsnap)
    scratch = str(tmp_path / "scratch")
    os.makedirs(scratch)
    frags = split_snapshot(snap, 3, sidecar_dir, scratch, 0)
    # sqlite-backed snapshots split into fragment DB files, not dicts
    assert any("db_fragment" in f["dedup"] for f in frags)

    # each new shard merges into its own spill store; the union of all
    # rows equals the source store
    merged_rows = {}
    for j, f in enumerate(frags):
        nst = build_dedup([f["dedup"]],
                          str(tmp_path / f"new{j}.sqlite"))
        rows = dict(nst.con.execute("SELECT k, ts FROM kv"))
        for k in rows:
            assert shard_of([k], 3)[0] == j
        merged_rows.update(rows)
        nst.close()
    want = dict(st.con.execute("SELECT k, ts FROM kv"))
    assert merged_rows == want
    st.close()


def test_build_dedup_targets_memory_backend_for_dict_fragments():
    a = DedupState(60 * US)
    a.process(["k1", "k2"], np.array([US, 2 * US]))
    b = DedupState(60 * US)
    b.process(["k3"], np.array([3 * US]))
    merged = build_dedup([a.snapshot(), b.snapshot()], None)
    assert isinstance(merged, DedupState)
    assert merged.last_seen == {"k1": US, "k2": 2 * US, "k3": 3 * US}
