"""Property pins for the round-3d analytics operators.

The oracle gate already hash-checks each operator against DuckDB on the
fixture tables; these tests pin the *algorithmic* invariants the
distributed shapes rely on — skyline mergeability, the Gini tied-rank
rewrite, gaps-and-islands against a brute-force scan — on adversarial
synthetic inputs the fixtures may not cover.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bitquery_kafka_streams_rust_ray.pipelines.queries import _skyline_points


def _brute_skyline(cents: np.ndarray, size: np.ndarray) -> set[tuple]:
    pts = set(zip(cents.tolist(), size.tolist()))
    out = set()
    for (c, s) in pts:
        dominated = any(
            (c2 <= c and s2 >= s and (c2 < c or s2 > s)) for (c2, s2) in pts
        )
        if not dominated:
            out.add((c, s))
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                min_size=1, max_size=40))
def test_skyline_matches_brute_force(points):
    cents = np.array([p[0] for p in points], dtype=np.int64)
    size = np.array([p[1] for p in points], dtype=np.int64)
    sc, ss = _skyline_points(cents, size)
    assert set(zip(sc.tolist(), ss.tolist())) == _brute_skyline(cents, size)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                min_size=2, max_size=40),
       st.integers(1, 5))
def test_skyline_is_mergeable(points, split):
    """skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)) — the identity
    that lets each block reduce to its local frontier."""
    cents = np.array([p[0] for p in points], dtype=np.int64)
    size = np.array([p[1] for p in points], dtype=np.int64)
    k = max(1, (len(points) * split) // 6)
    a_c, a_s = _skyline_points(cents[:k], size[:k])
    if k < len(points):
        b_c, b_s = _skyline_points(cents[k:], size[k:])
        m_c = np.concatenate([a_c, b_c])
        m_s = np.concatenate([a_s, b_s])
    else:
        m_c, m_s = a_c, a_s
    got = set(zip(*(x.tolist() for x in _skyline_points(m_c, m_s))))
    want = set(zip(*(x.tolist() for x in _skyline_points(cents, size))))
    assert got == want


def _gini_from_counts(values: np.ndarray) -> float:
    """The operator's tied-run rank rewrite, inlined."""
    v, c = np.unique(values, return_counts=True)
    r = np.concatenate(([0], np.cumsum(c)[:-1]))
    s_rank = int((v * (c * r + c * (c + 1) // 2)).sum())
    n = int(c.sum())
    total = int((v * c).sum())
    return 2.0 * float(s_rank) / float(n * total) - (n + 1.0) / n


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(1, 1000), min_size=2, max_size=100))
def test_gini_rank_rewrite_matches_definition(vals):
    """The (value, count) rewrite equals the mean-absolute-difference
    definition G = Σᵢⱼ|xᵢ−xⱼ| / (2 n² μ) for every tie structure."""
    x = np.array(vals, dtype=np.int64)
    n = len(x)
    mad = np.abs(x[:, None] - x[None, :]).sum()
    want = mad / (2.0 * n * n * x.mean())
    got = _gini_from_counts(x)
    assert got == pytest.approx(want, abs=1e-12)


def _brute_max_streak(days_by_user: dict[int, list[int]]) -> dict[int, int]:
    out = {}
    for u, days in days_by_user.items():
        ds = sorted(set(days))
        best = cur = 1
        for a, b in zip(ds, ds[1:]):
            cur = cur + 1 if b - a == 1 else 1
            best = max(best, cur)
        out[u] = best
    return out


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(st.integers(0, 5),
                       st.lists(st.integers(0, 30), min_size=1, max_size=25),
                       min_size=1, max_size=6))
def test_streak_islands_match_brute_force(days_by_user):
    """The vectorized break/diff island pass (the per-shard kernel of
    user_activity_streaks) equals the sequential definition."""
    rows = [(u, d) for u, days in days_by_user.items() for d in days]
    g = (pd.DataFrame(rows, columns=["user_id", "day"])
         .drop_duplicates().sort_values(["user_id", "day"]))
    u = g["user_id"].to_numpy(np.int64)
    d = g["day"].to_numpy(np.int64)
    brk = np.ones(len(u), dtype=bool)
    brk[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] != 1)
    starts = np.flatnonzero(brk)
    lengths = np.diff(np.append(starts, len(u)))
    isl = pd.DataFrame({"user_id": u[starts], "len": lengths})
    got = isl.groupby("user_id")["len"].max().to_dict()
    assert got == _brute_max_streak(days_by_user)


@pytest.mark.usefixtures("ray_session")
def test_markov_rows_normalize_and_conserve():
    """Each from-type's probabilities sum to 1 and the total transition
    count equals rows-minus-active-users (every user contributes
    len(events)-1 transitions)."""
    from bitquery_kafka_streams_rust_ray.pipelines import queries as q
    sf = "/root/testdata/sf0.001"
    out = q.markov_transitions_events(sf)
    sums = out.groupby("from_type")["prob_ppm"].sum()
    assert ((sums - 1_000_000).abs() < 100).all()
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
    expected = len(ev) - ev["user_id"].nunique()
    assert out["n"].sum() == expected


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(1, 20)),
                min_size=1, max_size=40))
def test_weighted_median_rule_matches_expansion(pairs):
    """The inverse-CDF rule (smallest v with 2·cumw ≥ W) equals the
    lower weighted median of the weight-expanded multiset."""
    vals = np.array([p[0] for p in pairs], dtype=np.int64)
    wts = np.array([p[1] for p in pairs], dtype=np.int64)
    order = np.argsort(vals, kind="mergesort")
    v, w = vals[order], wts[order]
    # collapse ties like the operator's (cents, w) reduce
    uv, inv = np.unique(v, return_inverse=True)
    uw = np.bincount(inv, weights=w).astype(np.int64)
    cum = np.cumsum(uw)
    got = uv[int(np.searchsorted(2 * cum, cum[-1]))]
    expanded = np.repeat(vals, wts)
    expanded.sort()
    want = expanded[(len(expanded) + 1) // 2 - 1]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=3, max_size=60))
def test_tercile_thresholds_are_minimal_covers(vals):
    """rfm_segments' threshold rule: t_i is the SMALLEST value whose
    cumulative count reaches i·n/3 — so ≤t_i covers at least i/3 of
    rows and any smaller value would not."""
    from bitquery_kafka_streams_rust_ray.pipelines.queries import rfm_segments  # noqa: F401
    v = np.array(vals, dtype=np.int64)
    uv, cnts = np.unique(v, return_counts=True)
    cum = np.cumsum(cnts)
    n = cum[-1]
    t1 = uv[int(np.searchsorted(3 * cum, n))]
    t2 = uv[int(np.searchsorted(3 * cum, 2 * n))]
    assert 3 * (v <= t1).sum() >= n
    assert (v < t1).sum() * 3 < n
    assert 3 * (v <= t2).sum() >= 2 * n
    assert (v < t2).sum() * 3 < 2 * n
    assert t1 <= t2


@settings(max_examples=300, deadline=None)
@given(st.integers(-10**12, 10**12), st.integers(1, 10**12))
def test_ppm_matches_decimal_half_away(num, den):
    # domain mirrors _ppm's contract: |num/den| small enough that the
    # ppm itself fits int64 (every caller is a share/rate or bounded avg)
    """_ppm == Decimal ROUND_HALF_UP (half away from zero) at 6 places —
    the DuckDB-compatible rounding the ratio outputs rely on."""
    from decimal import ROUND_HALF_UP, Decimal

    from bitquery_kafka_streams_rust_ray.pipelines.queries import _ppm

    got = int(_ppm(np.array([num], dtype=object),
                   np.array([den], dtype=object))[0])
    want = int((Decimal(num) * 1_000_000 / Decimal(den)).quantize(
        Decimal(1), rounding=ROUND_HALF_UP))
    assert got == want, (num, den, got, want)


@pytest.mark.usefixtures("ray_session")
def test_pairs_in_shards_matches_brute_force():
    """The shared co-basket kernel (pairs + per-item sizes + basket
    count) equals an itertools brute force on a synthetic frame with
    baskets spanning multiple blocks."""
    from itertools import combinations

    import pyarrow as pa
    import ray.data as rd

    from bitquery_kafka_streams_rust_ray.pipelines.queries import \
        _pairs_in_shards

    rng = np.random.RandomState(7)
    rows = [{"basket": int(rng.randint(0, 20)),
             "item": f"i{rng.randint(0, 6)}"} for _ in range(400)]
    df = pd.DataFrame(rows).assign(_shard=lambda d: d["basket"] % 4)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    pairs, sizes, n_baskets = _pairs_in_shards(
        ds, ["basket"], "item", with_sizes=True, with_basket_count=True)

    d = df.drop_duplicates(["basket", "item"])
    want_pairs = {}
    for _, grp in d.groupby("basket"):
        for x, y in combinations(sorted(grp["item"]), 2):
            want_pairs[(x, y)] = want_pairs.get((x, y), 0) + 1
    got_pairs = {(r.item_a, r.item_b): r.n for r in pairs.itertuples()}
    assert got_pairs == want_pairs
    assert sizes == d.groupby("item").size().to_dict()
    assert n_baskets == d["basket"].nunique()


@pytest.mark.usefixtures("ray_session")
def test_ewma_matches_sequential_recursion():
    """The grouped-ewm kernel equals the sequential definition
    e_i = a*x_i + (1-a)*e_{i-1} per user (adjust=False)."""
    from bitquery_kafka_streams_rust_ray.pipelines.queries import \
        ewma_last_per_user

    sf = "/root/testdata/sf0.001"
    got = ewma_last_per_user(sf).set_index("user_id")
    ev = (pd.read_parquet(f"{sf}/events.parquet",
                          columns=["event_id", "user_id", "ts", "value"])
          .sort_values(["user_id", "ts", "event_id"]))
    a = 0.3
    for uid, grp in ev.groupby("user_id"):
        e = None
        for x in grp["value"]:
            e = x if e is None else a * x + (1 - a) * e
        assert got.loc[uid, "n_events"] == len(grp)
        assert abs(got.loc[uid, "ewma6"] - e) < 1e-5, uid


def test_kcore_matches_replay():
    """Distributed k-core peeling is identical to a single-process
    replay over the same co-purchase edge kernel (distinct
    (order, part), pairs a<b co-occurring in >= 2 orders,
    simultaneous-removal schedule)."""
    import duckdb

    from bitquery_kafka_streams_rust_ray.pipelines.queries import kcore_copurchase

    sf = "/root/testdata/sf0.01"
    got = kcore_copurchase(sf, k=3)

    con = duckdb.connect()
    pairs = con.execute(f"""
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey
                   FROM '{sf}/lineitem.parquet'),
        e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
              FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey
              GROUP BY pa, pb HAVING count(*) >= 2)
        SELECT pa, pb FROM e""").df()
    adj: dict = {}
    for a, b in zip(pairs["pa"], pairs["pb"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    alive = set(adj)
    while True:
        deg = {n: sum(1 for m in adj[n] if m in alive)
               for n in alive}
        survivors = {n for n, d in deg.items() if d >= 3}
        if survivors == alive:
            break
        alive = survivors
        if not alive:
            break
    ref = pd.DataFrame(
        sorted((n, sum(1 for m in adj[n] if m in alive))
               for n in alive),
        columns=["node", "degree"]).astype(
        {"node": "int64", "degree": "int64"})
    if len(ref) == 0:
        assert len(got) == 0
    else:
        pd.testing.assert_frame_equal(got, ref)
