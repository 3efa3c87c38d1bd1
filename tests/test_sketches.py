"""Accuracy + merge-invariance pins for the mergeable sketches
(stages/sketches.py) — the scale path for COUNT(DISTINCT) and
quantiles. The driver records these queries rows-only (approximate by
construction); these tests ARE their oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from bitquery_kafka_streams_rust_ray.stages.sketches import (
    _hash_column,
    _hll_estimate,
    _hll_registers,
    histogram_quantiles,
    hll_distinct,
)

SF = "/root/testdata/sf0.01"

pytestmark = pytest.mark.usefixtures("ray_session")


def test_hll_registers_basics():
    # identical inputs -> identical registers (determinism), and a
    # single hash sets exactly one register
    h = _hash_column(pa.array([42], type=pa.int64()))
    r1, r2 = _hll_registers(h, 14), _hll_registers(h, 14)
    assert np.array_equal(r1, r2)
    assert np.count_nonzero(r1) == 1


def test_hll_estimate_accuracy_pure():
    # pure-numpy path: 100k distinct uint64s -> within 2% at p=14
    rng = np.random.default_rng(7)
    hashes = _hash_column(pa.array(rng.choice(10**9, 100_000, replace=False)))
    est = _hll_estimate(_hll_registers(hashes, 14))
    assert abs(est - 100_000) / 100_000 < 0.02


def test_hll_merge_invariance():
    # registers merged from two halves == registers of the whole
    vals = pa.array(np.arange(50_000, dtype=np.int64))
    h = _hash_column(vals)
    whole = _hll_registers(h, 12)
    merged = np.maximum(_hll_registers(h[:25_000], 12),
                        _hll_registers(h[25_000:], 12))
    assert np.array_equal(whole, merged)


def test_hll_distinct_vs_exact():
    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["event_type", "user_id"])
    got = hll_distinct(ds, "event_type", "user_id")
    exact = duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS n "
        f"FROM '{SF}/events.parquet' GROUP BY event_type ORDER BY event_type"
    ).df()
    merged = got.merge(exact, on="event_type")
    assert len(merged) == len(exact)
    rel = (merged["approx_distinct"] - merged["n"]).abs() / merged["n"]
    assert (rel < 0.02).all(), merged


def test_histogram_quantiles_vs_exact():
    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["event_type", "value"])
    got = histogram_quantiles(ds, "event_type", "value")
    exact = duckdb.sql(
        f"SELECT event_type, min(value) AS lo, max(value) AS hi, "
        f"quantile_disc(value, 0.50) AS p50, quantile_disc(value, 0.90) AS p90, "
        f"quantile_disc(value, 0.95) AS p95, quantile_disc(value, 0.99) AS p99 "
        f"FROM '{SF}/events.parquet' GROUP BY event_type ORDER BY event_type"
    ).df()
    merged = got.merge(exact, on="event_type", suffixes=("_est", "_ex"))
    assert len(merged) == len(exact)
    for p in ["p50", "p90", "p95", "p99"]:
        bin_width = (merged["hi"] - merged["lo"]) / 4096
        err = (merged[f"{p}_est"] - merged[f"{p}_ex"]).abs()
        assert (err <= bin_width + 1e-9).all(), (p, merged)


def test_histogram_quantiles_determinism_across_block_layouts():
    # same rows, different block structure -> byte-identical estimates
    ds1 = ray.data.read_parquet(f"{SF}/events.parquet",
                                columns=["event_type", "value"])
    ds2 = ds1.repartition(13)
    a = histogram_quantiles(ds1, "event_type", "value")
    b = histogram_quantiles(ds2, "event_type", "value")
    pd.testing.assert_frame_equal(a, b)


def test_bloom_no_false_negatives_and_fp_bound():
    import pyarrow as pa

    from bitquery_kafka_streams_rust_ray.stages.sketches import (
        BloomFilter,
        _hash_column,
    )

    members = np.arange(10_000, dtype=np.int64)
    others = np.arange(10_000, 30_000, dtype=np.int64)
    bf = BloomFilter.sized(len(members), fp_rate=0.01)
    bf.add_hashes(_hash_column(pa.array(members)))
    assert bf.contains_hashes(_hash_column(pa.array(members))).all()
    fp = bf.contains_hashes(_hash_column(pa.array(others))).mean()
    assert fp < 0.03, fp  # 3x headroom over the 1% design point


def test_bloom_merge_equals_whole():
    import pyarrow as pa

    from bitquery_kafka_streams_rust_ray.stages.sketches import (
        BloomFilter,
        _hash_column,
    )

    vals = np.arange(5000, dtype=np.int64)
    whole = BloomFilter.sized(5000)
    whole.add_hashes(_hash_column(pa.array(vals)))
    a = BloomFilter(whole.nbits, whole.k)
    b = BloomFilter(whole.nbits, whole.k)
    a.add_hashes(_hash_column(pa.array(vals[:2500])))
    b.add_hashes(_hash_column(pa.array(vals[2500:])))
    merged = a.merge(b)
    assert np.array_equal(whole.words, merged.words)


def test_distributed_bloom_semi_join_superset_of_exact():
    """bloom pre-filter keeps every true member (no false negatives)
    and lets through < fp_rate*3 of non-members; composed with the
    exact semi_join it reproduces the exact result."""
    import ray.data

    from bitquery_kafka_streams_rust_ray.stages.join import semi_join
    from bitquery_kafka_streams_rust_ray.stages.sketches import (
        bloom_semi_join,
        build_bloom,
    )

    events = ray.data.read_parquet(f"{SF}/events.parquet",
                                   columns=["event_id", "user_id"])
    cust = ray.data.read_parquet(f"{SF}/customer.parquet",
                                 columns=["c_custkey"])
    n_cust = cust.count()
    bloom = build_bloom(cust.map_batches(
        lambda t: t.rename_columns(["user_id"]), batch_format="pyarrow"),
        "user_id", n_items_hint=n_cust)
    pre = bloom_semi_join(events, bloom, "user_id").to_pandas()
    keys = set(duckdb.sql(
        f"SELECT c_custkey FROM '{SF}/customer.parquet'").df()["c_custkey"])
    exact = duckdb.sql(
        f"SELECT event_id, user_id FROM '{SF}/events.parquet' "
        f"WHERE user_id IN (SELECT c_custkey FROM "
        f"'{SF}/customer.parquet')").df()
    # superset, no false negatives
    assert set(exact["event_id"]).issubset(set(pre["event_id"]))
    extras = pre[~pre["user_id"].isin(keys)]
    assert len(extras) / max(1, len(pre)) < 0.03
    # composed with the exact membership pass -> exact result
    refined = semi_join(
        ray.data.from_pandas(pre), keys, col="user_id").to_pandas()
    assert sorted(refined["event_id"]) == sorted(exact["event_id"])


def test_heavy_hitters_guarantee_and_bounds():
    """MG guarantee: every item with true count > N/(k+1) survives, and
    estimates never exceed true counts (undercount semantics)."""
    import pyarrow as pa
    import ray.data

    from bitquery_kafka_streams_rust_ray.stages.sketches import heavy_hitters

    # skewed synthetic stream: item i appears 1000//(i+1) times
    items = [f"w{i}" for i in range(200) for _ in range(1000 // (i + 1))]
    ds = ray.data.from_arrow(pa.table({"w": items})).repartition(7)
    k = 32
    got = heavy_hitters(ds, "w", k=k)
    true = pd.Series(items).value_counts()
    n = len(items)
    # survival: every item above the threshold is present
    must_survive = set(true[true > n / (k + 1)].index)
    assert must_survive.issubset(set(got["item"]))
    # undercount: estimate <= true count, error bounded by N/(k+1)
    for _, row in got.iterrows():
        t = int(true.get(row["item"], 0))
        assert row["approx_count"] <= t
        assert t - row["approx_count"] <= n / (k + 1) + 1e-9


def test_heavy_hitters_bigrams_match_exact_top():
    """Over the documents corpus with a bigram items_fn, the exact top-5
    bigrams (from the oracle-checked top_bigrams query) all survive an
    MG pass with generous k."""
    import ray.data

    from bitquery_kafka_streams_rust_ray.stages.sketches import heavy_hitters

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])

    def bigrams(text):
        toks = (text or "").split()
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    got = heavy_hitters(ds, "text", k=512, items_fn=bigrams)
    exact = duckdb.sql(f"""
        WITH toks AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS w
                      FROM '{SF}/documents.parquet' WHERE trim(text) <> ''),
        pairs AS (SELECT w[i] || ' ' || w[i+1] AS bigram
                  FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) t)
        SELECT bigram, count(*) AS n FROM pairs GROUP BY bigram
        ORDER BY n DESC, bigram LIMIT 5""").df()
    assert set(exact["bigram"]).issubset(set(got["item"]))


# ---------------------------------------------------------------- CMS

def test_cms_overestimate_and_bound():
    """Count-min never undercounts, and with width 256 over a 2000-key
    domain the classic e*N/width bound holds for every probe."""
    from bitquery_kafka_streams_rust_ray.stages.sketches import (
        cms_partial, cms_query)
    rng = np.random.default_rng(11)
    # zipf-ish skew: heavy keys + a long tail to force collisions
    keys = np.concatenate([
        np.repeat(np.arange(20), 500),
        rng.integers(100, 2100, size=10_000)])
    vals = pa.array([f"k{int(v)}" for v in keys], pa.string())
    grid = cms_partial(vals, depth=4, width=256)
    probes = pa.array([f"k{i}" for i in range(20)], pa.string())
    est = cms_query(grid, probes)
    exact = np.array([int((keys == i).sum()) for i in range(20)])
    n = len(keys)
    assert (est >= exact).all()
    assert (est <= exact + np.e * n / 256).all()


def test_cms_merge_linearity():
    """Sketch of the whole == elementwise sum of part sketches — the
    property that makes per-block partials + one add-merge reduce
    exact-equivalent to sketching the stream in one pass."""
    from bitquery_kafka_streams_rust_ray.stages.sketches import cms_partial
    vals = [f"v{i % 37}" for i in range(1000)]
    whole = cms_partial(pa.array(vals), depth=4, width=64)
    parts = sum(cms_partial(pa.array(vals[i:i + 100]), depth=4, width=64)
                for i in range(0, 1000, 100))
    assert np.array_equal(whole, parts)


def test_cms_counts_distributed_matches_exact_on_small_domain():
    """End-to-end distributed path at a width where the 5-type domain
    cannot collide with itself enough to matter: estimates >= exact,
    and on this domain exactly equal (the Ray reduce is exact add-merge
    of the per-block grids)."""
    from bitquery_kafka_streams_rust_ray.stages.sketches import cms_counts
    ds = ray.data.read_parquet(SF + "/events.parquet",
                               columns=["event_type"])
    probes = ["click", "error", "purchase", "signup", "view"]
    out = cms_counts(ds, "event_type", probes, depth=4, width=2048)
    exact = (duckdb.sql(
        f"SELECT event_type, count(*) n FROM '{SF}/events.parquet' "
        "GROUP BY 1").df().set_index("event_type")["n"])
    got = out.set_index("item")["approx_count"]
    assert (got >= exact[got.index]).all()


def test_hll_overlap_accuracy():
    """Inclusion-exclusion overlap from merged HLL sketches lands
    within 3% of the exact purchase∩view user overlap at sf0.01."""
    import pyarrow.parquet as pq

    from bitquery_kafka_streams_rust_ray.pipelines.queries import hll_audience_overlap

    sf = "/root/testdata/sf0.01"
    got = hll_audience_overlap(sf)
    t = pq.read_table(sf + "/events.parquet",
                      columns=["event_type", "user_id"]).to_pandas()
    a = set(t[t.event_type == "purchase"]["user_id"])
    b = set(t[t.event_type == "view"]["user_id"])
    exact = len(a & b)
    est = int(got["est_overlap"][0])
    assert abs(est - exact) <= max(0.03 * exact, 2), (est, exact)
    assert abs(int(got["est_union"][0]) - len(a | b)) <= 0.03 * len(a | b)


def test_tdigest_pure_accuracy():
    """Pure-numpy digest: quantile estimates on a long-tailed sample
    land within tight relative error of the exact values, and merging
    split digests matches the whole-data digest's accuracy."""
    from bitquery_kafka_streams_rust_ray.stages.sketches import (_k1_cluster,
                                                 tdigest_quantile)

    rng = np.random.default_rng(3)
    v = rng.lognormal(0.0, 1.5, size=50_000)
    qs = np.array([0.01, 0.5, 0.9, 0.99])
    exact = np.quantile(v, qs)

    m, w = _k1_cluster(v, np.ones_like(v), delta=200)
    assert len(m) <= 250  # bounded summary
    est = tdigest_quantile(m, w, qs)
    assert np.all(np.abs(est - exact) / exact < 0.02), (est, exact)

    # merge path: 10 shard digests re-clustered == one-shot accuracy
    parts = [(_k1_cluster(c, np.ones_like(c), 200))
             for c in np.array_split(v, 10)]
    mm = np.concatenate([p[0] for p in parts])
    ww = np.concatenate([p[1] for p in parts])
    m2, w2 = _k1_cluster(mm, ww, 200)
    est2 = tdigest_quantile(m2, w2, qs)
    assert np.all(np.abs(est2 - exact) / exact < 0.03), (est2, exact)


def test_tdigest_percentiles_events_vs_exact(ray_session):
    """Distributed t-digest per-type percentiles within 2% relative of
    exact at sf0.01 (no range pre-pass, unbounded-domain sketch)."""
    import pyarrow.parquet as pq

    from bitquery_kafka_streams_rust_ray.pipelines.queries import (
        tdigest_percentiles_events)

    sf = "/root/testdata/sf0.01"
    got = tdigest_percentiles_events(sf).set_index("event_type")
    t = pq.read_table(sf + "/events.parquet",
                      columns=["event_type", "value"]).to_pandas()
    for g, sub in t.groupby("event_type"):
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            exact = float(np.quantile(sub["value"], q))
            est = float(got.loc[g, col])
            assert abs(est - exact) / max(abs(exact), 1e-9) < 0.02, \
                (g, col, est, exact)
