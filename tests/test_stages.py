"""Dataset-level operators vs single-process pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from bitquery_kafka_streams_rust_ray.stages.dedup import exact_dedup, windowed_dedup
from bitquery_kafka_streams_rust_ray.stages.join import (
    broadcast_asof_join,
    broadcast_join,
    hash_join,
    semi_join,
)
from bitquery_kafka_streams_rust_ray.stages.windows import (
    first_per_key,
    session_window_agg,
    windowed_agg,
)

US = 1_000_000
pytestmark = pytest.mark.usefixtures("ray_session")


def make_events(n=500, seed=3):
    rng = np.random.default_rng(seed)
    keys = rng.choice([f"k{i}" for i in range(12)], size=n)
    ts = np.sort(rng.integers(0, 600 * US, size=n)).astype("int64")
    val = rng.random(n).round(4)
    return pd.DataFrame(
        {"key": keys, "ts": pd.to_datetime(ts, unit="us"), "val": val,
         "row_id": np.arange(n)}
    )


def to_pdf(ds, sort_cols):
    df = ds.to_pandas()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def test_exact_dedup_matches_oracle():
    df = make_events()
    ds = rd.from_pandas(df)
    got = to_pdf(exact_dedup(ds, ["key"], ["ts", "row_id"], shards=8), ["key"])
    want = (
        df.sort_values(["ts", "row_id", "key"], kind="mergesort")
        .drop_duplicates("key", keep="first")
        .sort_values(["key"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_windowed_dedup_matches_oracle():
    df = make_events()
    window_s = 60.0
    ds = rd.from_pandas(df)
    got = to_pdf(windowed_dedup(ds, "key", "ts", window_s, shards=8), ["key", "ts"])
    o = df.sort_values(["key", "ts"], kind="mergesort")
    delta = o["ts"].astype("int64") // 1000 - (o["ts"].astype("int64") // 1000).shift()
    dup = o["key"].eq(o["key"].shift()) & (delta < window_s * US)
    want = o.loc[~dup].sort_values(["key", "ts"], kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_windowed_dedup_fixture_semantics():
    # dup within window -> second dropped; outside window -> both kept
    df = pd.DataFrame(
        {
            "key": ["u", "u", "v", "v"],
            "ts": pd.to_datetime([0, 100 * US, 0, 400 * US], unit="us"),
        }
    )
    got = to_pdf(windowed_dedup(rd.from_pandas(df), "key", "ts", 300.0, shards=2),
                 ["key", "ts"])
    assert got["key"].tolist() == ["u", "v", "v"]


def test_tumbling_window_agg_matches_oracle():
    df = make_events()
    ds = rd.from_pandas(df)
    out = windowed_agg(ds, ["key"], "ts", size_s=60, value_col="val",
                       count_name="n", total_name="total")
    got = to_pdf(out, ["key", "window_start"])
    o = df.copy()
    o["window_start"] = pd.to_datetime(
        (o["ts"].astype("int64") // 1000 // (60 * US)) * 60 * US, unit="us"
    )
    want = (
        o.groupby(["key", "window_start"])
        .agg(n=("val", "size"), total=("val", "sum"))
        .reset_index()
        .sort_values(["key", "window_start"], kind="mergesort")
        .reset_index(drop=True)
    )
    want["window_end"] = want["window_start"] + pd.Timedelta(seconds=60)
    got["total"] = got["total"].round(6)
    want["total"] = want["total"].round(6)
    pd.testing.assert_frame_equal(got[["key", "window_start", "window_end", "n", "total"]], want[["key", "window_start", "window_end", "n", "total"]])


def test_tumbling_salted_equals_unsalted():
    df = make_events()
    ds = rd.from_pandas(df)
    plain = to_pdf(windowed_agg(ds, ["key"], "ts", 60, value_col="val"),
                   ["key", "window_start"])
    salted = to_pdf(windowed_agg(ds, ["key"], "ts", 60, value_col="val",
                                 salt_shards=4), ["key", "window_start"])
    pd.testing.assert_frame_equal(
        plain.round({"total_value": 6}), salted.round({"total_value": 6})
    )


def test_sliding_window_agg_matches_oracle():
    df = make_events(300)
    ds = rd.from_pandas(df)
    out = windowed_agg(ds, ["key"], "ts", size_s=120, slide_s=60,
                       count_name="n", total_name="t")
    got = to_pdf(out, ["key", "window_start"])
    rows = []
    for _, r in df.iterrows():
        ts_us = r["ts"].value // 1000
        slide_start = (ts_us // (60 * US)) * 60 * US
        for i in range(2):
            rows.append((r["key"], slide_start - i * 60 * US))
    o = pd.DataFrame(rows, columns=["key", "window_start"])
    want = (
        o.groupby(["key", "window_start"]).size().rename("n").reset_index()
        .sort_values(["key", "window_start"], kind="mergesort").reset_index(drop=True)
    )
    want["window_start"] = pd.to_datetime(want["window_start"], unit="us")
    got = got[["key", "window_start", "n"]]
    pd.testing.assert_frame_equal(got, want[["key", "window_start", "n"]])


def test_session_window_agg_matches_oracle():
    # bursts with 10s spacing, gaps of 100s, gap threshold 30s
    ts = [0, 10, 20, 120, 130, 300]
    df = pd.DataFrame(
        {"key": ["h"] * 6, "ts": pd.to_datetime(np.array(ts) * US, unit="us"),
         "val": [1.0] * 6}
    )
    out = session_window_agg(rd.from_pandas(df), "key", "ts", gap_s=30,
                             value_col="val", shards=2,
                             count_name="n", total_name="t")
    got = to_pdf(out, ["key", "session_start"])
    starts = got["session_start"].astype("int64").tolist()
    ends = got["session_end"].astype("int64").tolist()
    assert [s // 10**9 for s in starts] == [0, 120, 300]
    assert [e // 10**9 for e in ends] == [50, 160, 330]
    assert got["n"].tolist() == [3, 2, 1]


def test_first_per_key():
    df = make_events(200)
    got = to_pdf(first_per_key(rd.from_pandas(df), ["key"], ["ts", "row_id"], shards=4),
                 ["key"])
    assert len(got) == df["key"].nunique()


def test_broadcast_join_with_defaults():
    df = pd.DataFrame({"host": ["a", "b", "c"], "v": [1, 2, 3]})
    small = pd.DataFrame({"host": ["a", "b"], "category": ["news", "blog"]})
    got = to_pdf(
        broadcast_join(rd.from_pandas(df), small, on="host",
                       defaults={"category": "unknown"}, concurrency=2),
        ["host"],
    )
    assert got["category"].tolist() == ["news", "blog", "unknown"]


def test_broadcast_asof_join():
    rows = pd.DataFrame(
        {"host": ["a", "a", "a", "b"],
         "warc_ts": pd.to_datetime([50, 150, 250, 100], unit="s"),
         }
    )
    meta = pd.DataFrame(
        {"host": ["a", "a", "b"],
         "weight": [1.0, 2.0, 9.0],
         "updated_ts": pd.to_datetime([0, 200, 500], unit="s")}
    )
    got = to_pdf(
        broadcast_asof_join(rd.from_pandas(rows), meta, on="host",
                            ts_col="warc_ts", defaults={"weight": 0.0},
                            concurrency=2),
        ["host", "warc_ts"],
    )
    # a@50 -> v1, a@150 -> v1, a@250 -> v2, b@100 -> no version yet -> default
    assert got["weight"].tolist() == [1.0, 1.0, 2.0, 0.0]


def test_semi_and_anti_join():
    df = pd.DataFrame({"url": ["x", "y", "z"], "v": [1, 2, 3]})
    ds = rd.from_pandas(df)
    assert to_pdf(semi_join(ds, ["x", "z"], "url"), ["url"])["url"].tolist() == ["x", "z"]
    assert to_pdf(semi_join(ds, ["x", "z"], "url", anti=True), ["url"])["url"].tolist() == ["y"]


def test_hash_join_matches_pandas():
    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": rng.choice(list("abcdefgh"), 200), "lv": rng.integers(0, 100, 200)})
    right = pd.DataFrame({"k": list("abcdxyz"), "rv": range(7)})
    got = to_pdf(hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                           buckets=4), ["k", "lv", "rv"])
    want = (
        left.merge(right, on="k", how="inner")
        .sort_values(["k", "lv", "rv"], kind="mergesort")
        .reset_index(drop=True)
    )
    got["lv"] = got["lv"].astype(want["lv"].dtype)
    got["rv"] = got["rv"].astype(want["rv"].dtype)
    pd.testing.assert_frame_equal(got[["k", "lv", "rv"]], want[["k", "lv", "rv"]])


def test_session_window_agg_us_dtype_regression():
    # datetime64[us] (what Arrow timestamp[us] round-trips to) must not
    # be rescaled as if it were nanoseconds
    ts = pd.to_datetime(
        ["2025-01-01 00:00:00", "2025-01-01 00:00:10", "2025-01-01 00:10:00"]
    ).astype("datetime64[us]")
    df = pd.DataFrame({"key": ["h"] * 3, "ts": ts})
    out = to_pdf(
        session_window_agg(rd.from_pandas(df), "key", "ts", gap_s=30, shards=2),
        ["session_start"],
    )
    assert out["doc_count"].tolist() == [2, 1]
    assert out["session_start"].iloc[0] == pd.Timestamp("2025-01-01 00:00:00")


def test_salted_hash_join_matches_plain_on_skew(ray_session):
    """A 90%-hot-key input joined with salts must equal the plain hash
    join row-for-row (inner join, salt replicas each match once)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from bitquery_kafka_streams_rust_ray.stages.join import (
        hash_join,
        salted_hash_join,
    )

    rng = np.random.default_rng(3)
    # left: 20k rows, 90% on key 7 (the skew), rest uniform over 100
    keys = np.where(rng.random(20_000) < 0.9, 7,
                    rng.integers(0, 100, 20_000))
    left = pd.DataFrame({"k": keys, "v": np.arange(20_000)})
    right = pd.DataFrame({"k": np.arange(100),
                          "w": np.arange(100) * 10})
    lds = ray.data.from_pandas(left).repartition(8)
    rds = ray.data.from_pandas(right).repartition(2)

    plain = hash_join(lds, rds, on="k", buckets=4).to_pandas()
    salted = salted_hash_join(
        ray.data.from_pandas(left).repartition(8),
        ray.data.from_pandas(right).repartition(2),
        on="k", salts=4, buckets=4).to_pandas()
    cols = sorted(plain.columns)
    a = plain[cols].sort_values(cols).reset_index(drop=True)
    b = salted[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
