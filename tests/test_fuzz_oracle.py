"""Adversarial-input oracle fuzz for the continuation-session operators.

The driver's correctness gate and `test_queries_oracle` run on the fixed
testdata tables; this module re-runs the session's new operators against
their DuckDB oracles on SEEDED-RANDOM tables built to stress the edges
those fixtures never hit: exact timestamp ties (within and across
users), single-event users, users whose first event is a purchase,
all-one-type users, users with every event at the same instant,
tie-heavy value distributions, and calendar holes. Deterministic: fixed
seeds, so a pass is stable run to run.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod
from test_queries_oracle import normalize, to_df

pytestmark = pytest.mark.usefixtures("ray_session")

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

EVENTS_QUERIES = [
    "max_concurrent_sessions",
    "state_intervals_events",
    "twap_value_per_user",
    "session_depth_histogram",
    "u_shape_attribution_events",
    "neighbor_count_events",
    "spike_events",
    "dwell_by_type_events",
    "conversion_latency_events",
    "timed_funnel_events",
    "users_all_event_types",
    "winsorized_stats_events",
    "fano_burstiness_types",
    "rolling7_active_users",
    "common_journeys",
    "mutual_info_type_hour",
    "k_anonymity_audit_events",
    "mannwhitney_purchase_view",
    "partition_skew_events",
    "capped_contribution_counts",
    "record_highs_events",
    "state_at_probes_events",
    "ks_test_purchase_view",
    "wasserstein_purchase_view",
]

ORDERS_QUERIES = [
    "order_date_gaps",
    "autocorr7_daily_revenue",
    "level_shift_daily_revenue",
    "gapfill_daily_revenue",
    "rolling_median_daily",
    "top1pct_revenue_share",
    "budget_allocation_nations",
    "nation_avg_percentile",
    "equidepth_bins_totalprice",
    "iso_week_orders",
    "theilsen_daily_revenue",
    "seasonality_dow_revenue",
]

# pre-session catalog entries over the same tables — regression net
LEGACY_QUERIES = [
    "zscore_events",
    "moving_sum_events",
    "trailing_hour_sum_events",
    "percentiles_events",
    "quantile_cont_events",
    "iqr_outliers_events",
    "value_histogram_events",
    "median_value_by_type",
    "mad_value_by_type",
    "distinct_users",
    "tumbling_events",
    "sliding_events",
    "session_events",
    "sessionize_events",
    "running_events",
    "first_event_per_user",
    "windowed_dedup_events",
    "event_trigrams",
    "markov_transitions_events",
    "cooccurrence_pairs_events",
    "basket_lift_events",
    "audience_jaccard_types",
    "lead_lag_events",
    "argmax_event_per_type",
    "mode_event_type_per_user",
    "corr_value_hour_by_type",
    "welch_ttest_events",
    "spearman_value_hour_by_type",
    "chi2_type_hour",
    "geomean_value_by_type",
    "linreg_value_hour_by_type",
    "funnel_events",
    "abandoned_views",
    "window_distinct_users",
    "cumulative_new_users",
    "stratified_sample_events",
    "exact_sample_events",
    "mom_revenue_growth",
    "revenue_drawdown",
    "order_quarters",
    "dow_orders",
    "topk_orders",
    "dense_rank_orders",
    "cume_dist_orders",
    "percent_rank_orders",
    "above_avg_orders",
    "cube_orders",
    "orders_interarrival",
    "benford_totalprice",
    "gini_totalprice",
    "keyset_checksum_monthly",
]

STAR_QUERIES = [
    "triangle_count_copurchase",
    "unpivot_lineitem",
    "fulfillment_lag_quantiles",
    "rank_movers_parts",
    "ship_lag_matrix",
    "top_parts_in_top_nations",
    "denormalized_star_checksum",
    "fuzzy_name_pairs_parts",
    "merge_upsert_documents",
    "dim_stats_embeddings",
    "brand_name_lcp",
    "containment_pairs_documents",
    "boilerplate_ngrams_documents",
    "temperature_mix_documents",
]

SEEDS = [7, 1231]


def _write(d: str, name: str, df: pd.DataFrame) -> None:
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, f"{name}.parquet"))


def make_events(d: str, seed: int) -> None:
    rng = np.random.default_rng(seed)
    n = 3000
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    span = 45 * 86_400 * 1_000_000
    ts = base + rng.integers(0, span, n)
    # 30% snap to whole minutes -> cross-user exact ties
    snap = rng.random(n) < 0.3
    ts[snap] -= ts[snap] % 60_000_000
    user = rng.integers(1, 61, n)
    # adversarial users: 55 = one event; 56 = all purchases; 57 = one
    # type only; 58 = every event at the same instant
    user[user == 55] = rng.integers(1, 50, (user == 55).sum())
    idx = rng.choice(n, 40, replace=False)
    user[idx[:1]] = 55
    user[idx[1:12]] = 56
    user[idx[12:26]] = 57
    user[idx[26:]] = 58
    et = rng.choice(EVENT_TYPES, n)
    et[user == 56] = "purchase"
    et[user == 57] = "click"
    ts[user == 58] = base + 7_777_000_123
    # tie-heavy values: half the rows draw from 12 distinct cents
    value = np.round(rng.uniform(0.01, 400.0, n), 2)
    tied = rng.random(n) < 0.5
    value[tied] = rng.choice(
        np.round(np.linspace(0.5, 300.0, 12), 2), tied.sum())
    _write(d, "events", pd.DataFrame({
        "event_id": np.arange(1, n + 1, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]"),
        "user_id": user.astype(np.int64),
        "event_type": et,
        "value": value,
        "props": ['{"k": 1}'] * n,
    }))


def make_orders(d: str, seed: int) -> None:
    rng = np.random.default_rng(seed + 99)
    n = 2500
    # inside the real testdata's 1995-2001 order range, straddling the
    # date constants (q1's 1997-06-01 cutoff, q3's 1998-01-01 window)
    # so those queries exercise non-trivially
    base_day = pd.Timestamp("1995-03-01").value // 1000
    # 200 of 1200 candidate days -> plenty of calendar holes
    days = np.sort(rng.choice(1200, 200, replace=False))
    od = base_day + rng.choice(days, n) * 86_400 * 1_000_000
    price = np.round(rng.uniform(10.0, 40_000.0, n), 2)
    tied = rng.random(n) < 0.3
    price[tied] = rng.choice(
        np.round(np.linspace(100.0, 9_000.0, 15), 2), tied.sum())
    _write(d, "orders", pd.DataFrame({
        "o_orderkey": np.arange(1, n + 1, dtype=np.int64),
        "o_custkey": rng.integers(1, 51, n).astype(np.int64),
        "o_orderstatus": rng.choice(["O", "F", "P"], n),
        "o_totalprice": price,
        "o_orderdate": pd.to_datetime(od, unit="us").astype(
            "datetime64[us]"),
        "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH", "3-LOW"], n),
    }))
    _write(d, "customer", pd.DataFrame({
        "c_custkey": np.arange(1, 51, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(1, 51)],
        "c_nationkey": rng.integers(0, 10, 50).astype(np.int64),
        "c_acctbal": np.round(rng.uniform(-999.0, 9_999.0, 50), 2),
        "c_mktsegment": rng.choice(
            ["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE",
             "HOUSEHOLD"], 50),
    }))
    _write(d, "nation", pd.DataFrame({
        "n_nationkey": np.arange(10, dtype=np.int64),
        "n_name": [f"NATION_{i:02d}" for i in range(10)],
        "n_regionkey": (np.arange(10) % 3).astype(np.int64),
    }))
    _write(d, "region", pd.DataFrame({
        "r_regionkey": np.arange(3, dtype=np.int64),
        "r_name": [f"REGION_{i}" for i in range(3)],
    }))


def make_star(d: str, seed: int) -> None:
    rng = np.random.default_rng(seed + 777)
    orders = pd.read_parquet(os.path.join(d, "orders.parquet"))
    # lineitem: 1-5 lines per order, small part domain so the
    # co-purchase graph has triangles
    k = rng.integers(1, 6, len(orders))
    okey = np.repeat(orders["o_orderkey"].to_numpy(np.int64), k)
    odate = np.repeat(
        orders["o_orderdate"].astype("datetime64[us]").to_numpy()
        .astype("int64"), k)
    n = len(okey)
    lnum = np.concatenate([np.arange(1, c + 1) for c in k])
    ship = odate + rng.integers(0, 90, n) * 86_400 * 1_000_000
    _write(d, "lineitem", pd.DataFrame({
        "l_orderkey": okey,
        "l_partkey": rng.integers(1, 81, n).astype(np.int64),
        "l_suppkey": rng.integers(1, 31, n).astype(np.int64),
        "l_linenumber": lnum.astype(np.int64),
        "l_quantity": rng.integers(1, 50, n).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(100.0, 90_000.0, n), 2),
        "l_discount": np.round(rng.uniform(0.0, 0.1, n), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, n), 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_linestatus": rng.choice(["O", "F"], n),
        "l_shipdate": pd.to_datetime(ship, unit="us").astype(
            "datetime64[us]"),
    }))
    # part names from a small vocab with near-collisions for the
    # fuzzy join
    adjs = ["red", "blue", "green", "hot", "cold", "big"]
    nouns = ["gear", "gears", "bolt", "bolts", "ring", "widget"]
    names = [f"{a} {b}" for a in adjs for b in nouns]
    _write(d, "part", pd.DataFrame({
        "p_partkey": np.arange(1, 81, dtype=np.int64),
        "p_name": rng.choice(names, 80),
        "p_brand": rng.choice(["B1", "B2"], 80),
        "p_type": rng.choice(["t1", "t2", "t3"], 80),
        "p_size": rng.integers(1, 50, 80).astype(np.int64),
        "p_retailprice": np.round(rng.uniform(900.0, 2_000.0, 80), 2),
    }))
    _write(d, "supplier", pd.DataFrame({
        "s_suppkey": np.arange(1, 31, dtype=np.int64),
        "s_name": [f"S{i:03d}" for i in range(1, 31)],
        "s_nationkey": rng.integers(0, 10, 30).astype(np.int64),
        "s_acctbal": np.round(rng.uniform(-999.0, 9_999.0, 30), 2),
    }))
    nd = 400
    words = ["alpha", "beta", "gamma", "delta", "omega", "zeta"]
    # 10-80 words (~60-480 chars) straddles the 290-char quality floor,
    # so the source gate keeps SOME sources and drops others
    texts = [" ".join(rng.choice(words, rng.integers(10, 80)))
             for _ in range(nd)]
    _write(d, "documents", pd.DataFrame({
        "doc_id": np.arange(1, nd + 1, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(["en", "fr", "es", "de", "zh"], nd),
        "source": rng.choice([f"src{i}" for i in range(8)], nd),
        "n_chars": np.array([len(t) for t in texts], np.int64),
    }))
    dim = 16
    vecs = np.round(rng.normal(0, 1, (200, dim)), 4).astype(np.float32)
    emb = pa.table({
        "vec_id": pa.array(np.arange(1, 201, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 4, 200).astype(np.int32)),
    })
    pq.write_table(emb, os.path.join(d, "embeddings.parquet"))


@pytest.fixture(scope="module", params=SEEDS)
def fuzz_dir(request, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"fuzz_{request.param}"))
    make_events(d, request.param)
    make_orders(d, request.param)
    make_star(d, request.param)
    return d


@pytest.fixture(scope="module")
def fuzz_con(fuzz_dir):
    con = duckdb.connect()
    for t in ("events", "orders", "customer", "nation", "region",
              "lineitem", "part", "supplier", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{os.path.join(fuzz_dir, t)}.parquet'")
    return con


_LISTED = set(EVENTS_QUERIES + ORDERS_QUERIES + STAR_QUERIES
              + LEGACY_QUERIES)
# every other oracle entry rides a single-seed full-catalog wave;
# exclusions are entries whose semantics need the driver fixtures
FULL_WAVE_EXCLUDE = set()
FULL_WAVE = sorted(set(entrymod.oracle_sql()) - _LISTED
                   - FULL_WAVE_EXCLUDE)


@pytest.mark.parametrize("name",
                         EVENTS_QUERIES + ORDERS_QUERIES + STAR_QUERIES
                         + LEGACY_QUERIES)
def test_fuzz_matches_oracle(name, fuzz_dir, fuzz_con):
    got = normalize(to_df(entrymod.queries()[name](fuzz_dir)))
    want = normalize(fuzz_con.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), f"{name} columns"
    assert len(got) == len(want), (
        f"{name} rows: {len(got)} vs {len(want)}")
    pd.testing.assert_frame_equal(got, want, check_dtype=False, obj=name,
                                  check_exact=True)


@pytest.fixture(scope="module")
def fuzz_dir_one(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzz_full_7"))
    make_events(d, 7)
    make_orders(d, 7)
    make_star(d, 7)
    return d


@pytest.fixture(scope="module")
def fuzz_con_one(fuzz_dir_one):
    con = duckdb.connect()
    for t in ("events", "orders", "customer", "nation", "region",
              "lineitem", "part", "supplier", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{os.path.join(fuzz_dir_one, t)}.parquet'")
    return con


@pytest.mark.parametrize("name", FULL_WAVE)
def test_fuzz_full_catalog(name, fuzz_dir_one, fuzz_con_one):
    got = normalize(to_df(entrymod.queries()[name](fuzz_dir_one)))
    want = normalize(
        fuzz_con_one.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), f"{name} columns"
    assert len(got) == len(want), (
        f"{name} rows: {len(got)} vs {len(want)}")
    pd.testing.assert_frame_equal(got, want, check_dtype=False, obj=name,
                                  check_exact=True)
