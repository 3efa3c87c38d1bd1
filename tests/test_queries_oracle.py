"""Cross-check every queries() entry against its oracle_sql() via DuckDB
at sf0.001 — mirrors the driver's correctness gate (row count + sorted
column names + order-insensitive values)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t)}.parquet'"
        )
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


ORACLE_NAMES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, con):
    ray_fn = entrymod.queries()[name]
    got = normalize(to_df(ray_fn(SF_DIR)))
    want = normalize(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), f"{name} columns"
    assert len(got) == len(want), f"{name} row count: {len(got)} vs {len(want)}"
    # the driver's value hash is dtype-sensitive (int64 1 != float64 1.0,
    # datetime64[s] != [us]); normalize() only folds within a family, so
    # any cross-family drift must fail here, not at the driver
    assert list(got.dtypes.astype(str)) == list(want.dtypes.astype(str)), (
        f"{name} dtypes: {dict(got.dtypes.astype(str))} vs "
        f"{dict(want.dtypes.astype(str))}")
    pd.testing.assert_frame_equal(got, want, check_dtype=False, obj=name,
                                  check_exact=True)


def test_rows_only_queries_run():
    qs = entrymod.queries()
    oracles = set(entrymod.oracle_sql())
    rows_only = [n for n in qs if n not in oracles and n != "streaming_flagship"]
    for name in rows_only:
        df = to_df(qs[name](SF_DIR))
        assert len(df) > 0, name


def test_entry_smoke():
    df = to_df(entrymod.entry())
    assert len(df) >= 0
    assert "doc_count" in df.columns


def test_zscore_zero_variance_group_matches_oracle(tmp_path, con):
    """ADVICE fix: a group whose values are all equal (stddev_pop = 0)
    must yield NaN like the oracle's 0/0, not inf from a raw division."""
    from bitquery_kafka_streams_rust_ray.pipelines import queries as q

    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [1, 1, 2, 2, 3],
        "event_type": ["flat", "flat", "vary", "vary", "flat"],
        "ts": pd.to_datetime(["2024-01-01"] * 5).astype("datetime64[us]"),
        "value": [5.0, 5.0, 1.0, 3.0, 5.0],
        "props": ['{"k":1}'] * 5,
    })
    d = tmp_path / "degen"
    d.mkdir()
    pa.parquet.write_table(pa.Table.from_pandas(df), str(d / "events.parquet"))

    got = normalize(to_df(q.zscore_events(str(d))))
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    want = normalize(c.execute(entrymod.oracle_sql()["zscore_events"]).df())
    assert got["z"].isna().sum() == 3  # the zero-variance group
    assert not np.isinf(got["z"].fillna(0)).any()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  obj="zscore_zero_variance")


def test_bigram_lm_join_paths_identical():
    """The size-adaptive join switch must not change results: force the
    partitioned hash-join path (threshold 0) and compare it to the
    default broadcast path frame-for-frame."""
    from bitquery_kafka_streams_rust_ray.pipelines import queries as q

    small = q.bigram_lm_documents(SF_DIR)
    big = q.bigram_lm_documents(SF_DIR, broadcast_threshold_bytes=0)
    pd.testing.assert_frame_equal(small, big, obj="bigram_lm paths")


def test_segment_orders_join_paths_identical():
    """segment_orders' size-adaptive dimension join must not change
    results: force the partitioned hash-join path (threshold 0) and
    compare it to the default broadcast path frame-for-frame."""
    from bitquery_kafka_streams_rust_ray.pipelines import queries as q

    small = q.segment_orders(SF_DIR)
    big = q.segment_orders(SF_DIR, broadcast_threshold_bytes=0)
    pd.testing.assert_frame_equal(small, big, obj="segment_orders paths")


def test_heavy_hitters_truncating_merge(tmp_path):
    """Forced-skew table: 5k distinct cold keys vs capacity 16, so
    every block partial AND the driver merge truncate — the MG
    guarantee (candidates contain every key above n/(capacity+1))
    must still deliver the exact brute-force answer after the verify
    pass."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_
    from bitquery_kafka_streams_rust_ray.pipelines import queries as q

    rng = np.random.default_rng(5)
    hot = np.repeat([900001, 900002], [3000, 1500])
    cold = rng.integers(1, 5001, 5500)
    users = rng.permutation(np.r_[hot, cold]).astype(np.int64)
    d = tmp_path / "hh"
    d.mkdir()
    pq_.write_table(pa.table({"user_id": users}),
                    str(d / "events.parquet"))

    got = q.heavy_hitters_events(str(d), phi_ppm=100_000, capacity=16)
    vals, counts = np.unique(users, return_counts=True)
    want = sorted(int(v) for v, c in zip(vals, counts)
                  if 1_000_000 * int(c) > 100_000 * len(users))
    assert got["user_id"].tolist() == want == [900001, 900002]
    assert got["n_events"].tolist() == [3000, 1500]


def test_mg_partial_keeps_count_row_when_truncation_empties():
    """An all-distinct block ties every count at the (capacity+1)-th
    largest, so MG truncation legitimately empties the summary — but
    the block's row count must survive (losing it would lower the
    phi threshold and admit false heavy hitters)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from bitquery_kafka_streams_rust_ray.pipelines.q_vectors import _mg_partial_table

    t = _mg_partial_table(pa.array(np.arange(4096, dtype=np.int64)),
                          capacity=16)
    counts = t.filter(t["is_count"])
    assert counts.num_rows == 1
    assert counts["n_rows"].to_pylist() == [4096]
    assert t.filter(pc.invert(t["is_count"])).num_rows == 0  # emptied
