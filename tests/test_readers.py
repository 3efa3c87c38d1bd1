"""Multi-format sources: JSONL/CSV round-trip to the normalized schema."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bitquery_kafka_streams_rust_ray.sources.readers import read_table, write_jsonl_shard

pytestmark = pytest.mark.usefixtures("ray_session")


def sample_table():
    return pa.table({
        "url": ["https://a.com/1", "https://b.com/2"],
        "warc_ts": pa.array(
            pd.to_datetime(["2025-01-01 00:00:01.500000",
                            "2025-01-01 00:00:02.000000"])
            .astype("datetime64[us]")
        ),
        "html": pa.array([b"\x1f\x8bpayload", b"\x00binary"],
                         type=pa.large_binary()),
        "lang": ["en", "de"],
    })


def test_jsonl_round_trip(tmp_path):
    t = sample_table()
    p = str(tmp_path / "pages.jsonl")
    write_jsonl_shard(t, p, binary_b64_cols=["html"])
    ds = read_table(p, fmt="jsonl", ts_cols=["warc_ts"],
                    binary_b64_cols=["html"],
                    columns=["url", "warc_ts", "html", "lang"])
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    want = t.to_pandas()
    assert got["url"].tolist() == want["url"].tolist()
    assert got["html"].tolist() == want["html"].tolist()
    assert got["warc_ts"].astype("datetime64[us]").tolist() == \
        want["warc_ts"].tolist()


def test_csv_reader_parses_timestamps(tmp_path):
    p = str(tmp_path / "events.csv")
    pd.DataFrame({
        "event_id": [1, 2],
        "ts": ["2025-01-01T00:00:01.000000", "2025-01-01T00:00:02.500000"],
        "value": [1.5, 2.5],
    }).to_csv(p, index=False)
    ds = read_table(p, fmt="csv", ts_cols=["ts"])
    got = ds.to_pandas().sort_values("event_id")
    assert str(got["ts"].dtype).startswith("datetime64")
    assert got["value"].tolist() == [1.5, 2.5]


def test_parquet_passthrough_prunes_columns(tmp_path):
    p = str(tmp_path / "pages.parquet")
    pq.write_table(sample_table(), p)
    ds = read_table(p, fmt="parquet", columns=["url", "lang"])
    assert set(ds.schema().names) == {"url", "lang"}
