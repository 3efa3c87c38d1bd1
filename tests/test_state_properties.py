"""Property-based (hypothesis) pins for the state stores.

The engine's core determinism claim is that incremental folding —
events arriving in epochs, interleaved with watermark closes, state
snapshot/restored at arbitrary points — produces exactly the output of
a single-process batch computation. These properties generate random
streams, random epoch boundaries, and random chunkings and assert that
equivalence for every store.

Feeding respects the engine invariant the streaming driver enforces:
an event with ``ts < watermark`` is never delivered after ``close``
ran at that watermark (late rows are dropped at the gate, so accepted
rows are never late).
"""

import numpy as np
from hypothesis import example, given, settings, strategies as st

from bitquery_kafka_streams_rust_ray.state.store import (DedupState,
                                                         FunnelState,
                                                         SessionState,
                                                         TopKState,
                                                         WindowState)

US = 1_000_000


def _epochs(events, cuts):
    """Partition (ts-keyed) events into watermark epochs [cut_i, cut_i+1)."""
    out = []
    lo = -(10 ** 18)
    for hi in cuts:
        out.append(([e for e in events if lo <= e[0] < hi], hi))
        lo = hi
    out.append(([e for e in events if e[0] >= lo], 10 ** 18))
    return out


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2000),        # ts
        st.integers(min_value=0, max_value=5),           # key id
        st.integers(min_value=1, max_value=9),           # integer payload
    ),
    min_size=1, max_size=120,
)

cuts_strategy = st.lists(
    st.integers(min_value=1, max_value=2100), min_size=1, max_size=5,
).map(sorted)


@settings(deadline=None)
@given(events=events_strategy, cuts=cuts_strategy, gap=st.integers(5, 400))
def test_sessions_incremental_equals_batch(events, cuts, gap):
    # batch oracle: all events at once, one final close
    batch = SessionState(gap)
    ts = np.array([e[0] for e in events], dtype=np.int64)
    keys = [f"k{e[1]}" for e in events]
    tot = np.array([float(e[2]) for e in events])
    batch.add(keys, ts, tot)
    want = batch.close(10 ** 18)

    # incremental: epoch-partitioned feed + close at each watermark,
    # with a snapshot/restore round-trip between epochs
    inc = SessionState(gap)
    got = []
    for epoch_events, wm in _epochs(events, cuts):
        if epoch_events:
            inc.add(
                [f"k{e[1]}" for e in epoch_events],
                np.array([e[0] for e in epoch_events], dtype=np.int64),
                np.array([float(e[2]) for e in epoch_events]),
            )
        got.extend(inc.close(wm))
        inc = SessionState.restore(inc.snapshot())
    assert sorted(got) == sorted(want)


@settings(deadline=None)
@given(events=events_strategy, cuts=cuts_strategy, window=st.integers(1, 500))
def test_dedup_incremental_with_eviction_equals_batch(events, cuts, window):
    # the shard sorts each epoch's rows by (key, ts) before processing;
    # the batch oracle sees the same rows sorted the same way globally.
    # Survivor multiset must match despite interleaved evictions.
    def fold(state, evs):
        evs = sorted(evs, key=lambda e: (e[1], e[0]))
        if not evs:
            return []
        keys = [f"k{e[1]}" for e in evs]
        ts = np.array([e[0] for e in evs], dtype=np.int64)
        keep = state.process(keys, ts)
        return [e for e, k in zip(evs, keep) if k]

    # batch epochs must match incremental epoch boundaries (dedup is
    # epoch-sequential by design); the property under test is that
    # EVICTION at each watermark never changes any decision
    plain = DedupState(window)
    evicting = DedupState(window)
    for epoch_events, wm in _epochs(events, cuts):
        assert fold(plain, epoch_events) == fold(evicting, epoch_events)
        evicting.evict(wm)
        evicting = DedupState.restore(evicting.snapshot())


@settings(deadline=None)
@given(events=events_strategy, cuts=cuts_strategy, size=st.integers(10, 300))
def test_tumbling_windows_incremental_equals_batch(events, cuts, size):
    def partial(evs):
        # one (key, window) partial per event — worst-case chunking
        keys = [f"k{e[1]}" for e in evs]
        starts = np.array([(e[0] // size) * size for e in evs], dtype=np.int64)
        ends = starts + size
        counts = np.ones(len(evs), dtype=np.int64)
        totals = np.array([float(e[2]) for e in evs])
        return keys, starts, ends, counts, totals

    batch = WindowState()
    batch.add_partials("t", *partial(events))
    want = batch.close(10 ** 18)

    inc = WindowState()
    got = []
    for epoch_events, wm in _epochs(events, cuts):
        if epoch_events:
            inc.add_partials("t", *partial(epoch_events))
        got.extend(inc.close(wm))
        inc = WindowState.restore(inc.snapshot())
    got.extend(inc.close(10 ** 18))
    assert sorted(got) == sorted(want)


@settings(deadline=None)
@given(
    adds=st.lists(
        st.tuples(st.integers(0, 9), st.integers(1, 50)),
        min_size=1, max_size=80,
    ),
    chunks=st.integers(1, 6),
    k=st.integers(1, 5),
)
def test_topk_chunked_adds_equal_counter(adds, chunks, k):
    from collections import Counter

    want_counts = Counter()
    for key_id, n in adds:
        want_counts[f"h{key_id}"] += n
    want = sorted(want_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    state = TopKState(k)
    for i in range(chunks):
        part = adds[i::chunks]
        if part:
            state.add([f"h{e[0]}" for e in part],
                      np.array([e[1] for e in part], dtype=np.int64))
        state = TopKState.restore(state.snapshot())
    assert state.top() == want


@settings(deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2000),          # ts
            st.integers(0, 3),             # key
            st.integers(0, 2),             # stage
        ),
        min_size=1, max_size=80,
    ),
    cuts=cuts_strategy,
    within=st.integers(10, 2000),
)
def test_funnel_incremental_equals_batch(events, cuts, within):
    # batch oracle: greedy earliest chain per key over all events
    def batch():
        out = []
        for kid in sorted({e[1] for e in events}):
            evs = sorted((ts, s) for ts, k, s in events if k == kid)
            t, chain = None, []
            for stage in range(3):
                cand = [ts for ts, s in evs
                        if s == stage and (t is None or ts > t)]
                if not cand:
                    chain = None
                    break
                t = min(cand)
                chain.append(t)
            if chain and chain[-1] - chain[0] <= within:
                out.append((f"k{kid}", chain[0], chain[-1]))
        return sorted(out)

    inc = FunnelState(3, within)
    got = []
    for epoch_events, wm in _epochs(events, cuts):
        if epoch_events:
            inc.add(
                [f"k{e[1]}" for e in epoch_events],
                np.array([e[2] for e in epoch_events], dtype=np.int64),
                np.array([e[0] for e in epoch_events], dtype=np.int64),
            )
        got.extend(inc.close(wm))
        inc = FunnelState.restore(inc.snapshot())
    assert sorted(got) == batch()


@settings(deadline=None)
@given(events=events_strategy, cuts=cuts_strategy, window=st.integers(1, 500))
def test_spill_dedup_equals_dict_backend(events, cuts, window):
    """The sqlite-backed store is decision-identical to the dict store
    over random streams with interleaved eviction and snapshot/restore
    round-trips (including a cross-backend restore of the blob image)."""
    from bitquery_kafka_streams_rust_ray.state.store import SpillDedupState, restore_dedup

    def fold(state, evs):
        evs = sorted(evs, key=lambda e: (e[1], e[0]))
        if not evs:
            return []
        keys = [f"k{e[1]}" for e in evs]
        ts = np.array([e[0] for e in evs], dtype=np.int64)
        keep = state.process(keys, ts)
        return [e for e, k in zip(evs, keep) if k]

    ref = DedupState(window)
    spill = SpillDedupState(window)
    for epoch_events, wm in _epochs(events, cuts):
        assert fold(ref, epoch_events) == fold(spill, epoch_events)
        assert ref.evict(wm) == spill.evict(wm)
        ref = DedupState.restore(ref.snapshot())
        spill = restore_dedup(spill.snapshot())


@settings(deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),   # ts (ARRIVAL order)
            st.integers(min_value=0, max_value=3),     # key id
        ),
        min_size=1, max_size=80,
    ),
    epoch_size=st.integers(min_value=1, max_value=20),
    gap=st.integers(5, 60),
    horizon=st.integers(1, 120),
)
# the exact retention boundary: the late row at ts=10 satisfies both
# ts == watermark - horizon (accepted) and ts == retained session end
# (merges), so the retained emission must survive aging at
# end + horizon == watermark — random search almost never lands on the
# double coincidence, hence the pinned example
@example(events=[(0, 0), (15, 0), (10, 0)], epoch_size=1, gap=10,
         horizon=5)
def test_session_changelog_view_equals_batch(events, epoch_size, gap,
                                             horizon):
    """Update-mode contract: base emissions patched by the retract/add
    changelog (plus the drain) equal one batch pass over exactly the
    rows the engine accepts. Events arrive OUT OF ORDER; the mapper's
    acceptance rule (ts >= frozen_watermark - horizon) decides which
    rows both sides see, so this pins acceptance, retention aging,
    reopen/merge and the changelog algebra against each other."""
    inc = SessionState(gap, update_horizon_us=horizon)
    wm = -(10 ** 18)
    accepted: list[tuple[int, int]] = []
    base: list[tuple] = []
    changelog: list[tuple] = []
    for i in range(0, len(events), epoch_size):
        epoch = events[i:i + epoch_size]
        ok = [e for e in epoch if e[0] >= wm - horizon]
        accepted.extend(ok)
        if ok:
            inc.add([f"k{e[1]}" for e in ok],
                    np.array([e[0] for e in ok], dtype=np.int64),
                    np.ones(len(ok)))
            wm = max(wm, max(e[0] for e in ok))
        base.extend(inc.close(wm))
        changelog.extend(inc.pop_updates(wm))
        inc = SessionState.restore(inc.snapshot())
    base.extend(inc.close(10 ** 18))
    changelog.extend(inc.pop_updates(10 ** 18))

    view = {}
    for key, s, e, c, t in base:
        view[(key, s, e)] = (c, t)
    for key, s, e, c, t, action, _rev in changelog:
        if action == "retract":
            assert view.pop((key, s, e)) == (c, t)
        else:
            view[(key, s, e)] = (c, t)

    batch = SessionState(gap)
    if accepted:
        batch.add([f"k{e[1]}" for e in accepted],
                  np.array([e[0] for e in accepted], dtype=np.int64),
                  np.ones(len(accepted)))
    want = {(key, s, e): (c, t)
            for key, s, e, c, t in batch.close(10 ** 18)}
    assert view == want


@settings(deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),   # ts (ARRIVAL order)
            st.integers(min_value=0, max_value=3),     # key id
        ),
        min_size=1, max_size=80,
    ),
    epoch_size=st.integers(min_value=1, max_value=20),
    width=st.integers(5, 60),
    horizon=st.integers(1, 120),
)
def test_window_corrections_view_equals_batch(events, epoch_size, width,
                                              horizon):
    """Update-mode window contract, the revision-based sibling of the
    session changelog property: base emissions superseded by each
    window's highest-revision correction must equal one batch pass over
    exactly the accepted rows."""
    from bitquery_kafka_streams_rust_ray.state.store import WindowState

    def add(ws, rows):
        ws.add_partials(
            "t", [f"k{e[1]}" for e in rows],
            np.array([(e[0] // width) * width for e in rows],
                     dtype=np.int64),
            np.array([(e[0] // width) * width + width for e in rows],
                     dtype=np.int64),
            np.ones(len(rows), dtype=np.int64),
            np.ones(len(rows)),
        )

    inc = WindowState(update_horizon_us=horizon)
    wm = -(10 ** 18)
    accepted: list[tuple[int, int]] = []
    view: dict = {}
    for i in range(0, len(events), epoch_size):
        epoch = events[i:i + epoch_size]
        ok = [e for e in epoch if e[0] >= wm - horizon]
        accepted.extend(ok)
        if ok:
            add(inc, ok)
            wm = max(wm, max(e[0] for e in ok))
        for _k, key, s, e, c, t in inc.close(wm):
            view[(key, s)] = (e, c, t)
        for _k, key, s, e, c, t, _rev in inc.pop_updates(wm):
            assert (key, s) in view  # corrections only revise emitted rows
            view[(key, s)] = (e, c, t)
        inc = WindowState.restore(inc.snapshot(),
                                  update_horizon_us=horizon)
    for _k, key, s, e, c, t in inc.close(10 ** 18):
        view[(key, s)] = (e, c, t)
    for _k, key, s, e, c, t, _rev in inc.pop_updates(10 ** 18):
        view[(key, s)] = (e, c, t)

    batch = WindowState()
    if accepted:
        add(batch, accepted)
    want = {(key, s): (e, c, t)
            for _k, key, s, e, c, t in batch.close(10 ** 18)}
    assert view == want


@settings(deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=300),  # ts
            st.integers(min_value=0, max_value=3),    # key id
            st.integers(min_value=0, max_value=3),    # stage (3 = veto)
        ),
        min_size=1, max_size=80,
    ),
    cuts=st.lists(st.integers(min_value=1, max_value=320),
                  min_size=1, max_size=5).map(sorted),
    within=st.integers(5, 200),
    use_veto=st.booleans(),
)
def test_funnel_incremental_equals_batch_semantics(events, cuts, within,
                                                   use_veto):
    """The streaming FunnelState (veto + timeouts) must equal one batch
    pass over the same events, for EVERY epoch layout:

    * match: greedy chain completes at t2 <= t0 + within, with no veto
      strictly inside (t0, t2) — an equal-ts veto loses to completion;
    * silent kill: a veto in (t0, t0 + within] while the chain is
      incomplete (no row at all);
    * timeout: started, not matched, not vetoed — (t0, t0 + within,
      in-bound reached count).

    Events fold in (ts, stage) order, so the batch truth below is a
    direct transcription of those rules over the greedy chain times.
    """
    n = 3
    veto = 3 if use_veto else None
    if not use_veto:
        # without a veto bound the engine's searchsorted classifies the
        # largest pages as the top chain stage, never stage n
        events = [(ts, kid, min(stage, 2)) for ts, kid, stage in events]
    W = within * US
    inc = FunnelState(n, W, veto_stage=veto, emit_timeouts=True)
    lo = 0
    matches, timeouts = [], []
    for hi in [*cuts, 10 ** 9]:
        epoch = [e for e in events if lo <= e[0] < hi]
        lo = hi
        if epoch:
            inc.add([f"k{e[1]}" for e in epoch],
                    np.array([e[2] for e in epoch], dtype=np.int64),
                    np.array([e[0] * US for e in epoch], dtype=np.int64))
        matches.extend(inc.close(hi * US))
        timeouts.extend(inc.pop_timeouts())
        inc = FunnelState.restore(inc.snapshot())

    # batch truth: greedy chain times per key in (ts, stage) order
    want_matches, want_timeouts = [], []
    by_key: dict[str, list] = {}
    for ts, kid, stage in sorted(events, key=lambda e: (e[0], e[2])):
        by_key.setdefault(f"k{kid}", []).append((ts * US, stage))
    for key, evs in sorted(by_key.items()):
        chain = [None] * n
        for ts, stage in evs:
            if stage == 0:
                if chain[0] is None:
                    chain[0] = ts
            elif stage < n and chain[stage] is None:
                prev = chain[stage - 1]
                if prev is not None and ts > prev:
                    chain[stage] = ts
        if chain[0] is None:
            continue
        t0, t2 = chain[0], chain[n - 1]
        done = t2 is not None and t2 - t0 <= W
        vts = [ts for ts, stage in evs if stage == veto] if veto else []
        if done:
            if any(t0 < v < t2 for v in vts):
                continue  # vetoed during the (winning) chain: silent
            want_matches.append((key, t0, t2))
        else:
            if any(t0 < v <= t0 + W for v in vts):
                continue  # vetoed inside the pattern window: silent
            bound = t0 + W
            reached = sum(1 for t in chain if t is not None and t <= bound)
            want_timeouts.append((key, t0, bound, reached))
    assert sorted(matches) == sorted(want_matches)
    assert sorted(timeouts) == sorted(want_timeouts)


@settings(deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),   # ts (ARRIVAL order)
            st.integers(min_value=0, max_value=2),     # key id
            st.integers(min_value=0, max_value=9),     # url id
        ),
        min_size=1, max_size=60,
    ),
    epoch_size=st.integers(min_value=1, max_value=15),
    bound=st.integers(1, 120),
)
def test_interval_join_incremental_equals_batch(events, epoch_size, bound):
    """Streaming interval self-join over out-of-order arrivals: the
    emitted pair set must equal all pairs within the bound over exactly
    the rows a zero-lateness mapper accepts (ts >= frozen watermark) —
    eviction (ts + bound < watermark) must never lose a reachable pair.
    Duplicate (key, ts, url) arrivals are excluded up front: the engine
    dedups before the feed, and set semantics need unique rows."""
    from bitquery_kafka_streams_rust_ray.state.store import (
        IntervalJoinState)

    seen, uniq = set(), []
    for e in events:
        if (e[0], e[1], e[2]) not in seen:
            seen.add((e[0], e[1], e[2]))
            uniq.append(e)
    events = uniq

    inc = IntervalJoinState(bound)
    wm = -(10 ** 18)
    accepted, got = [], []
    for i in range(0, len(events), epoch_size):
        epoch = events[i:i + epoch_size]
        ok = [e for e in epoch if e[0] >= wm]
        accepted.extend(ok)
        if ok:
            inc.add([f"k{e[1]}" for e in ok],
                    [f"u{e[2]}" for e in ok],
                    np.array([e[0] for e in ok], dtype=np.int64))
            wm = max(wm, max(e[0] for e in ok))
        got.extend(inc.close(wm))
        inc = IntervalJoinState.restore(inc.snapshot())
    got.extend(inc.close(10 ** 18))

    want = set()
    by_key: dict[str, list] = {}
    for ts, kid, uid in accepted:
        by_key.setdefault(f"k{kid}", []).append((ts, f"u{uid}"))
    for key, rows in by_key.items():
        rows.sort()
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if rows[j][0] - rows[i][0] <= bound:
                    want.add((key, rows[i][1], rows[i][0],
                              rows[j][1], rows[j][0]))
    assert set(got) == want
    assert len(got) == len(want)  # each pair exactly once


@settings(deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),     # window key id
            st.integers(min_value=0, max_value=40),    # value (host) id
        ),
        min_size=1, max_size=120,
    ),
    layout=st.integers(min_value=1, max_value=10),     # partial batch size
)
def test_distinct_window_state_layout_invariant(events, layout):
    """DistinctWindowState merge algebra: folding per-batch HLL
    registers + value lists in ANY batch layout (with snapshot
    round-trips) yields exactly the same close() rows as one batch —
    the exact companion equals the true distinct count, and the HLL
    estimate is a pure function of the value SET (elementwise-max
    merge is lossless w.r.t. the one-shot registers)."""
    from bitquery_kafka_streams_rust_ray.stages.hashing import hash_strings
    from bitquery_kafka_streams_rust_ray.stages.sketches import (
        _hll_registers, _splitmix64)
    from bitquery_kafka_streams_rust_ray.state.store import (
        DistinctWindowState)

    def partial(batch):
        keys, starts, ends, blobs, vals = [], [], [], [], []
        by = {}
        for k, v in batch:
            by.setdefault(k, set()).add(f"h{v}")
        for k, vs in sorted(by.items()):
            hosts = np.asarray(sorted(vs), dtype=object)
            keys.append(f"w{k}")
            starts.append(0)
            ends.append(100)
            blobs.append(_hll_registers(
                _splitmix64(hash_strings(hosts)), 8).tobytes())
            vals.append(hosts.tolist())
        return keys, np.array(starts), np.array(ends), blobs, vals

    one = DistinctWindowState(p=8)
    one.add_partials(*partial(events))
    want = one.close(200)

    inc = DistinctWindowState(p=8)
    for i in range(0, len(events), layout):
        inc.add_partials(*partial(events[i:i + layout]))
        inc = DistinctWindowState.restore(inc.snapshot())
    got = inc.close(200)
    assert got == want
    # the exact companion is truly exact
    truth = {}
    for k, v in events:
        truth.setdefault(f"w{k}", set()).add(f"h{v}")
    assert {(r[0], r[3]) for r in got} == {
        (k, len(vs)) for k, vs in truth.items()}


@settings(deadline=None)
@given(
    events=st.lists(st.integers(min_value=0, max_value=30),
                    min_size=1, max_size=300),
    max_keys=st.integers(min_value=2, max_value=8),
    layout=st.integers(min_value=1, max_value=25),
)
def test_topk_misra_gries_error_bound(events, max_keys, layout):
    """TopKState with a memory cap: stored counts are lower bounds with
    the classic Misra-Gries guarantee true_count - stored <=
    total / (max_keys + 1), keys outside the store satisfy the same
    bound with stored = 0, and the key count stays <= 2 * max_keys."""
    st_ = TopKState(5, max_keys=max_keys)
    true = {}
    total = 0
    for i in range(0, len(events), layout):
        chunk = [f"k{e}" for e in events[i:i + layout]]
        st_.add(chunk, np.ones(len(chunk), dtype=np.int64))
        for c in chunk:
            true[c] = true.get(c, 0) + 1
        total += len(chunk)
        st_ = TopKState.restore(st_.snapshot())
        assert len(st_.counts) <= 2 * max_keys
    bound = total / (max_keys + 1)
    for k, t in true.items():
        stored = st_.counts.get(k, 0)
        assert stored <= t
        assert t - stored <= bound, (k, t, stored, bound)
