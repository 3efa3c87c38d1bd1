"""State-store semantics: ports deduplicator.rs:88-150 tests to event time.

The dedup tests run against BOTH backends (in-memory dict and the
sqlite-backed ``SpillDedupState``) — same semantics contract.
"""

import numpy as np
import pytest

from bitquery_kafka_streams_rust_ray.state.store import (DedupState, SessionState,
                                                         SpillDedupState, WindowState,
                                                         restore_dedup)
from bitquery_kafka_streams_rust_ray.state.watermark import WatermarkTracker

US = 1_000_000


@pytest.fixture(params=["dict", "sqlite", "sqlite-file"])
def make_dedup(request, tmp_path):
    def make(window_us):
        if request.param == "dict":
            return DedupState(window_us)
        path = (str(tmp_path / "dedup.sqlite")
                if request.param == "sqlite-file" else None)
        return SpillDedupState(window_us, path)
    return make


def run(st, pairs):
    keys = [k for k, _ in pairs]
    ts = np.array([t for _, t in pairs], dtype=np.int64)
    return list(st.process(keys, ts))


def test_dedup_new_message(make_dedup):
    st = make_dedup(1 * US)
    assert run(st, [("sig1", 0)]) == [True]


def test_dedup_duplicate_within_window(make_dedup):
    st = make_dedup(1 * US)
    assert run(st, [("sig1", 0), ("sig1", US // 2)]) == [True, False]


def test_dedup_duplicate_outside_window(make_dedup):
    # deduplicator.rs:107-118: process / dup / wait past window / process / dup
    st = make_dedup(US)
    assert run(st, [("sig1", 0)]) == [True]
    assert run(st, [("sig1", US // 10)]) == [False]
    # the duplicate refreshed last_seen to US//10; window passes from there
    assert run(st, [("sig1", US // 10 + US)]) == [True]
    assert run(st, [("sig1", US // 10 + US + 1)]) == [False]


def test_dedup_boundary_exact_window_passes(make_dedup):
    st = make_dedup(US)
    # strict `< window` duplicate check => delta == window is NOT a dup
    assert run(st, [("k", 0), ("k", US)]) == [True, True]
    assert run(st, [("k", 2 * US - 1)]) == [False]


def test_dedup_multiple_signatures(make_dedup):
    st = make_dedup(US)
    assert run(st, [("a", 0), ("b", 1), ("a", 2), ("b", 3), ("c", 4)]) == [
        True, True, False, False, True,
    ]


def test_dedup_watermark_eviction(make_dedup):
    st = make_dedup(US)
    run(st, [("old", 0), ("new", 5 * US)])
    evicted = st.evict(watermark_us=3 * US)  # horizon = 2s; only "old" stale
    assert evicted == 1
    # evicted key behaves as brand new; surviving key still dedups
    assert run(st, [("old", 3 * US)]) == [True]
    assert run(st, [("new", 5 * US + 1)]) == [False]


def test_dedup_snapshot_restore(make_dedup, tmp_path):
    st = make_dedup(US)
    run(st, [("a", 0), ("b", 1)])
    st2 = restore_dedup(st.snapshot(), str(tmp_path / "restored.sqlite"))
    assert type(st2) is type(st)  # snapshots are backend-self-describing
    assert run(st2, [("a", 2)]) == [False]
    assert st2.window_us == US


def test_window_state_accumulate_and_close():
    st = WindowState()
    st.add_partials(
        "tumbling:lang", ["en", "de"],
        np.array([0, 0]), np.array([60 * US, 60 * US]),
        np.array([3, 2]), np.array([30.0, 20.0]),
    )
    st.add_partials(
        "tumbling:lang", ["en"],
        np.array([60 * US]), np.array([120 * US]),
        np.array([5]), np.array([50.0]),
    )
    # watermark at 60s closes only the first window
    closed = st.close(60 * US)
    assert closed == [
        ("tumbling:lang", "de", 0, 60 * US, 2, 20.0),
        ("tumbling:lang", "en", 0, 60 * US, 3, 30.0),
    ]
    # second close is idempotent for already-emitted windows
    assert st.close(60 * US) == []
    assert st.close(120 * US) == [("tumbling:lang", "en", 60 * US, 120 * US, 5, 50.0)]


def test_window_state_snapshot_roundtrip():
    st = WindowState()
    st.add_partials("t", ["k"], np.array([0]), np.array([US]), np.array([1]), np.array([2.0]))
    st2 = WindowState.restore(st.snapshot())
    assert st2.close(US) == [("t", "k", 0, US, 1, 2.0)]


def test_session_state_merge_and_close():
    gap = 10 * US
    st = SessionState(gap_us=gap)
    st.add(["h", "h"], np.array([0, 5 * US]), np.array([1.0, 1.0]))
    # event at 30s: > gap from 5s -> new session
    st.add(["h"], np.array([30 * US]), np.array([1.0]))
    assert len(st.sessions["h"]) == 2
    # bridging event at 14s merges [0,5] and... 14-5=9<=gap, 30-14=16>gap: joins first only
    st.add(["h"], np.array([14 * US]), np.array([1.0]))
    assert len(st.sessions["h"]) == 2
    closed = st.close(watermark_us=30 * US)  # first session ends 14+10=24 < 30
    assert closed == [("h", 0, 24 * US, 3, 3.0)]
    assert len(st.sessions["h"]) == 1


def test_session_bridge_merges_two_sessions():
    gap = 10 * US
    st = SessionState(gap_us=gap)
    st.add(["h"], np.array([0]), np.array([1.0]))
    st.add(["h"], np.array([20 * US]), np.array([1.0]))
    assert len(st.sessions["h"]) == 2
    st.add(["h"], np.array([10 * US]), np.array([1.0]))  # bridges both
    assert len(st.sessions["h"]) == 1
    s = st.sessions["h"][0]
    assert (s.start, s.last, s.count) == (0, 20 * US, 3)


def test_session_boundary_gap_exact_extends():
    gap = 10 * US
    st = SessionState(gap_us=gap)
    st.add(["h"], np.array([0]), np.array([1.0]))
    st.add(["h"], np.array([10 * US]), np.array([1.0]))  # delta == gap -> extend
    assert len(st.sessions["h"]) == 1


def test_session_snapshot_roundtrip():
    st = SessionState(gap_us=10 * US)
    st.add(["h"], np.array([0]), np.array([2.0]))
    st2 = SessionState.restore(st.snapshot())
    assert st2.close(100 * US) == [("h", 0, 10 * US, 1, 2.0)]


def test_watermark_monotone_and_late():
    wm = WatermarkTracker(allowed_lateness_us=2 * US)
    wm.observe(10 * US)
    assert wm.watermark_us == 8 * US
    wm.observe(5 * US)  # regression ignored
    assert wm.watermark_us == 8 * US
    assert wm.is_late(8 * US - 1)
    assert not wm.is_late(8 * US)
    wm2 = WatermarkTracker.restore(wm.snapshot())
    assert wm2.watermark_us == 8 * US


# --- FunnelState (streaming CEP funnel) -----------------------------------


def _fold_all(st, events, wm):
    """events: list of (key, stage, ts_us)."""
    import numpy as np

    keys = [e[0] for e in events]
    stages = np.array([e[1] for e in events], dtype=np.int64)
    ts = np.array([e[2] for e in events], dtype=np.int64)
    st.add(keys, stages, ts)
    return st.close(wm)


def test_funnel_basic_match_and_within():
    from bitquery_kafka_streams_rust_ray.state.store import FunnelState

    st = FunnelState(3, within_us=100)
    out = _fold_all(
        st,
        [("a", 0, 10), ("a", 1, 20), ("a", 2, 30),   # match, span 20
         ("b", 0, 10), ("b", 1, 20), ("b", 2, 200)],  # span 190 > 100
        wm=1000,
    )
    assert out == [("a", 10, 30)]


def test_funnel_strict_order_and_greedy_earliest():
    from bitquery_kafka_streams_rust_ray.state.store import FunnelState

    st = FunnelState(3, within_us=1000)
    # stage-1 before any stage-0 doesn't count; equal ts doesn't chain
    out = _fold_all(
        st,
        [("k", 1, 5), ("k", 0, 10), ("k", 1, 10), ("k", 1, 30),
         ("k", 1, 20), ("k", 2, 25), ("k", 2, 21)],
        wm=1000,
    )
    # chain: t0=10, t1=min(20,30)=20, t2=min ts>20 = 21
    assert out == [("k", 10, 21)]


def test_funnel_exactly_once_across_watermarks():
    from bitquery_kafka_streams_rust_ray.state.store import FunnelState
    import numpy as np

    st = FunnelState(2, within_us=10**9)
    st.add(["k"], np.array([0]), np.array([100]))
    assert st.close(50) == []          # nothing below wm yet
    assert st.close(150) == []         # only stage 0 folded
    st.add(["k"], np.array([1]), np.array([200]))
    assert st.close(300) == [("k", 100, 200)]
    # later events on a matched key never re-emit
    st.add(["k"], np.array([0]), np.array([400]))
    st.add(["k"], np.array([1]), np.array([500]))
    assert st.close(1000) == []


def test_funnel_timeout_eviction_no_restart():
    from bitquery_kafka_streams_rust_ray.state.store import FunnelState
    import numpy as np

    st = FunnelState(2, within_us=100)
    st.add(["k"], np.array([0]), np.array([10]))
    assert st.close(500) == []         # wm > t0+within: chain dead
    assert "k" in st.done and "k" not in st.chains
    # a fresh stage-0 + stage-1 later must NOT match (batch semantics:
    # the greedy chain start is the earliest stage-0 event, which failed)
    st.add(["k", "k"], np.array([0, 1]), np.array([600, 650]))
    assert st.close(1000) == []


def test_funnel_snapshot_roundtrip():
    from bitquery_kafka_streams_rust_ray.state.store import FunnelState
    import numpy as np

    st = FunnelState(3, within_us=100)
    st.add(["a", "a", "b"], np.array([0, 1, 0]), np.array([10, 20, 30]))
    st.close(15)  # folds a's stage-0 only
    st2 = FunnelState.restore(st.snapshot())
    st.add(["a"], np.array([2]), np.array([40]))
    st2.add(["a"], np.array([2]), np.array([40]))
    assert st.close(1000) == st2.close(1000) == [("a", 10, 40)]


def test_funnel_matches_batch_operator_semantics():
    """Incremental fold across many watermarks == stages/cep.py greedy
    chain over the same (non-late) event set."""
    import numpy as np
    from bitquery_kafka_streams_rust_ray.state.store import FunnelState

    rng = np.random.default_rng(11)
    n_keys, within = 30, 500
    events = []
    for k in range(n_keys):
        for _ in range(rng.integers(2, 20)):
            events.append((f"k{k}", int(rng.integers(0, 3)),
                           int(rng.integers(0, 2000))))

    # batch oracle: greedy earliest chain per key
    def batch():
        out = []
        for k in sorted({e[0] for e in events}):
            evs = sorted((ts, s) for key, s, ts in events if key == k)
            t = None
            chain = []
            for stage in range(3):
                cand = [ts for ts, s in evs
                        if s == stage and (t is None or ts > t)]
                if not cand:
                    return_chain = None
                    chain = None
                    break
                t = min(cand)
                chain.append(t)
            if chain and chain[-1] - chain[0] <= within:
                out.append((k, chain[0], chain[-1]))
        return sorted(out)

    st = FunnelState(3, within_us=within)
    emitted = []
    # feed in arrival order with advancing watermarks (bounded disorder)
    events_arrival = sorted(events, key=lambda e: e[2] + (hash(e[0]) % 97))
    cuts = [0, 300, 700, 1100, 1600, 10**6]
    lo = 0
    for wm in cuts[1:]:
        batch_evs = [e for e in events_arrival if lo <= e[2] < wm]
        lo = wm
        if batch_evs:
            st.add([e[0] for e in batch_evs],
                   np.array([e[1] for e in batch_evs]),
                   np.array([e[2] for e in batch_evs]))
        emitted.extend(st.close(wm))
    assert sorted(emitted) == batch()


# --- TopKState (running top-k leaderboard) --------------------------------


def test_topk_exact_counts_and_ordering():
    from bitquery_kafka_streams_rust_ray.state.store import TopKState
    import numpy as np

    st = TopKState(3)
    st.add(["a", "b", "c"], np.array([5, 3, 3]))
    st.add(["b", "d"], np.array([4, 6]))
    # counts: a=5 b=7 c=3 d=6 -> top3 = b,d,a; ties broken by key asc
    assert st.top() == [("b", 7), ("d", 6), ("a", 5)]
    st2 = TopKState.restore(st.snapshot())
    assert st2.top() == st.top()


def test_topk_sharded_merge_is_exact():
    """Global top-k == k-merge of per-shard top-k when key ownership is
    disjoint — the property the streaming emission relies on."""
    from bitquery_kafka_streams_rust_ray.state.store import TopKState
    import numpy as np

    rng = np.random.default_rng(7)
    keys = [f"h{i}" for i in range(40)]
    counts = {k: int(rng.integers(1, 1000)) for k in keys}
    shards = [TopKState(5) for _ in range(4)]
    for k, c in counts.items():
        shards[hash(k) % 4].add([k], np.array([c]))
    cands = [kv for s in shards for kv in s.top()]
    got = TopKState.merge_top(cands, 5)
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == want


def test_topk_mg_cap_keeps_heavy_hitters():
    """With max_keys the counts become lower bounds but every key with
    true count > total/(cap+1) survives (Misra-Gries guarantee)."""
    from bitquery_kafka_streams_rust_ray.state.store import TopKState
    import numpy as np

    st = TopKState(2, max_keys=4)
    # heavy: x appears 50 times among 90 total adds
    for i in range(90):
        key = "x" if i % 2 == 0 or i < 10 else f"t{i}"
        st.add([key], np.array([1]))
    assert len(st.counts) <= 8  # bounded memory (2 * max_keys shrink point)
    top = st.top()
    assert top[0][0] == "x"
    assert top[0][1] <= 55  # lower bound, never over-counts


@pytest.mark.parametrize("backend", ["dict", "memory_spill", "file_spill"])
def test_dedup_size_gauge_o1_and_exact(tmp_path, backend):
    """size() tracks the true key count through process/evict/snapshot/
    restore on every backend — incrementally for the spill store (no
    per-epoch B-tree walk)."""
    from bitquery_kafka_streams_rust_ray.state.store import (
        DedupState, SpillDedupState, restore_dedup)

    if backend == "dict":
        st = DedupState(100)
    else:
        st = SpillDedupState(
            100, str(tmp_path / "d.sqlite")
            if backend == "file_spill" else None)
    st.process(["a", "b", "a", "c"], np.array([0, 1, 2, 3]))
    assert st.size() == 3
    st.process(["d", "a"], np.array([4, 5]))
    assert st.size() == 4
    st.evict(150)  # horizon 50: every key's last ts < 50
    assert st.size() == 0
    st.process(["x", "y"], np.array([200, 201]))
    assert st.size() == 2

    st2 = restore_dedup(st.snapshot(),
                        str(tmp_path / "r.sqlite")
                        if backend == "file_spill" else None)
    assert st2.size() == 2
    if backend == "file_spill":
        snap = st.snapshot_to_file(str(tmp_path / "cp.sqlite"))
        st3 = restore_dedup(snap, str(tmp_path / "live.sqlite"),
                            sidecar_dir=str(tmp_path))
        assert st3.size() == 2
