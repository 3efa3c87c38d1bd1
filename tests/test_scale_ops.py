"""Property tests for the round-5 scale operators: the candidate-
pruning logic (AllPairs prefix filter + ownership, Misra-Gries
truncation) must be invisible — results equal brute force on random
structures the fixed tables never produce."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as hst

from bitquery_kafka_streams_rust_ray.pipelines import queries as q

pytestmark = pytest.mark.usefixtures("ray_session")


@settings(deadline=None, max_examples=12)
@given(seed=hst.integers(min_value=0, max_value=2**31),
       n_orders=hst.integers(min_value=2, max_value=60),
       n_parts=hst.integers(min_value=2, max_value=25),
       max_items=hst.integers(min_value=1, max_value=8))
def test_setsim_join_matches_bruteforce(tmp_path_factory, seed, n_orders,
                                        n_parts, max_items):
    """Random basket structures (dup rows, singleton baskets, shared
    rare/common tokens): the prefix-filtered join must equal the
    all-pairs brute force exactly — any missed candidate, double
    emission, or ownership mistake shows up as a row diff."""
    rng = np.random.default_rng(seed)
    rows = []
    for o in range(1, n_orders + 1):
        k = int(rng.integers(1, max_items + 1))
        for p in rng.choice(n_parts, size=k, replace=True):
            rows.append((o, int(p) + 1))
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    d = tmp_path_factory.mktemp("setsim")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "lineitem.parquet"))

    got = q.setsim_join_orders(str(d))

    baskets = {o: set(g["l_partkey"]) for o, g in df.groupby("l_orderkey")}
    want = []
    orders = sorted(baskets)
    for i, a in enumerate(orders):
        for b in orders[i + 1:]:
            inter = len(baskets[a] & baskets[b])
            na, nb = len(baskets[a]), len(baskets[b])
            if 2 * inter >= na + nb - inter and inter > 0:
                want.append((a, b, round(inter / (na + nb - inter), 6)))
    want_df = (pd.DataFrame(want, columns=["order_a", "order_b", "jac6"])
               .sort_values(["order_a", "order_b"])
               .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want_df, check_dtype=False,
                                  obj="setsim vs brute force")


@settings(deadline=None, max_examples=12)
@given(seed=hst.integers(min_value=0, max_value=2**31),
       n_rows=hst.integers(min_value=1, max_value=4000),
       n_keys=hst.integers(min_value=1, max_value=600),
       skew=hst.floats(min_value=0.0, max_value=3.0),
       capacity=hst.sampled_from([200, 201, 256, 300]))
def test_heavy_hitters_matches_bruteforce(tmp_path_factory, seed, n_rows,
                                          n_keys, skew, capacity):
    """Random cardinality/skew (zipf-ish), capacities at and above the
    guarantee bound (capacity+1 > 1e6/phi_ppm for phi=5000): the MG
    candidates + exact verify must equal the brute-force threshold
    answer — including when block truncation empties summaries."""
    rng = np.random.default_rng(seed)
    w = (np.arange(1, n_keys + 1, dtype=np.float64)) ** (-skew)
    users = rng.choice(n_keys, size=n_rows, p=w / w.sum()) + 1
    d = tmp_path_factory.mktemp("hh")
    pq.write_table(pa.table({"user_id": users.astype(np.int64)}),
                   str(d / "events.parquet"))

    got = q.heavy_hitters_events(str(d), phi_ppm=5000, capacity=capacity)

    vals, counts = np.unique(users, return_counts=True)
    hot = [(int(v), int(c)) for v, c in zip(vals, counts)
           if 1_000_000 * int(c) > 5000 * n_rows]
    want = (pd.DataFrame(hot, columns=["user_id", "n_events"])
            .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False,
        obj="heavy hitters vs brute force")


def test_bloom_semijoin_empty_build_side(tmp_path_factory):
    """No customer in the segment: the filter must yield an EMPTY
    exact result (all-zeros bloom rejects everything), not crash on
    the empty key set."""
    d = tmp_path_factory.mktemp("bloom")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_mktsegment": pa.array(["MACHINERY"] * 3)}),
        str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64())}),
        str(d / "orders.parquet"))
    out = q.bloom_semijoin_orders(str(d), segment="BUILDING")
    assert len(out) == 0


def test_new_entries_handle_empty_inputs(tmp_path_factory):
    """Fully-empty input tables: schema-stable empty results, never a
    schema-less-frame crash (the partition of a 100-TB run CAN be
    empty)."""
    d = tmp_path_factory.mktemp("empty")
    pq.write_table(pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "o_totalprice": pa.array([], pa.float64())}),
                   str(d / "orders.parquet"))
    pq.write_table(pa.table({"user_id": pa.array([], pa.int64()),
                             "ts": pa.array([], pa.timestamp("us"))}),
                   str(d / "events.parquet"))
    assert list(q.priority_sample_orders(str(d)).columns) == [
        "o_orderkey", "w_cents", "priority"]
    assert list(q.sliding_distinct_users(str(d)).columns) == [
        "window_start", "window_end", "n_users"]
    assert list(q.heavy_hitters_events(str(d)).columns) == [
        "user_id", "n_events"]
    for fn in (q.priority_sample_orders, q.sliding_distinct_users,
               q.heavy_hitters_events):
        assert len(fn(str(d))) == 0


@settings(deadline=None, max_examples=10)
@given(seed=hst.integers(min_value=0, max_value=2**31),
       n=hst.integers(min_value=1, max_value=3000),
       n_prices=hst.integers(min_value=1, max_value=5))
def test_priority_sample_matches_bruteforce(tmp_path_factory, seed, n,
                                            n_prices):
    """Random order tables with HEAVY weight ties (few distinct
    prices): the distributed partial-top-k + merge must equal the
    single-pass brute force, including (priority, id) tie-breaks that
    cross block boundaries."""
    from bitquery_kafka_streams_rust_ray.stages.hashing import multiplicative_hash_u32

    rng = np.random.default_rng(seed)
    ids = rng.permutation(np.arange(1, n + 1)).astype(np.int64)
    prices = rng.choice(
        np.round(rng.uniform(1, 500, n_prices), 2), n)
    d = tmp_path_factory.mktemp("ps")
    pq.write_table(pa.table({"o_orderkey": pa.array(ids),
                             "o_totalprice": pa.array(prices)}),
                   str(d / "orders.parquet"))

    got = q.priority_sample_orders(str(d))

    cents = np.round(prices * 100).astype(np.int64)
    h = multiplicative_hash_u32(ids)
    pr = ((cents.astype(np.uint64) << np.uint64(32))
          // (h + np.uint64(1))).astype(np.int64)
    order = np.lexsort((ids, -pr))[:200]
    want = (pd.DataFrame({"o_orderkey": ids[order],
                          "w_cents": cents[order],
                          "priority": pr[order]})
            .sort_values("o_orderkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  obj="priority sample vs brute force")


@settings(deadline=None, max_examples=10)
@given(seed=hst.integers(min_value=0, max_value=2**31),
       n=hst.integers(min_value=1, max_value=3000),
       snap=hst.floats(min_value=0.0, max_value=1.0))
def test_sliding_distinct_matches_bruteforce(tmp_path_factory, seed, n,
                                             snap):
    """Random event times with a tunable fraction snapped EXACTLY to
    hour boundaries (the window-edge hazard): per-sliding-window
    distinct users must equal brute force."""
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01").value // 1000
    ts = base + rng.integers(0, 5 * 86_400_000_000, n)
    hit = rng.random(n) < snap
    ts[hit] -= ts[hit] % 3_600_000_000
    users = rng.integers(1, 50, n).astype(np.int64)
    d = tmp_path_factory.mktemp("sd")
    pq.write_table(pa.table({
        "user_id": pa.array(users),
        "ts": pa.array(ts).cast(pa.timestamp("us"))}),
        str(d / "events.parquet"))

    got = q.sliding_distinct_users(str(d))

    hour = 3_600_000_000
    s0 = (ts // hour) * hour
    pairs = set(zip(np.r_[s0, s0 - hour], np.r_[users, users]))
    agg: dict[int, set] = {}
    for w, u in pairs:
        agg.setdefault(int(w), set()).add(int(u))
    want = (pd.DataFrame(
        {"ws": sorted(agg),
         "n_users": [len(agg[w]) for w in sorted(agg)]}))
    want["window_start"] = pd.to_datetime(want["ws"], unit="us")
    want["window_end"] = pd.to_datetime(want["ws"] + 2 * hour, unit="us")
    want = want[["window_start", "window_end", "n_users"]]
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True),
                                  check_dtype=False,
                                  obj="sliding distinct vs brute force")
