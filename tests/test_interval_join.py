"""Streaming dual-buffer interval self-join (copage_pairs): pair
geometry, exactly-once emission across epoch layouts, watermark
eviction, snapshot round-trips, and flagship engine-vs-oracle."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.functions.filters import PageFilter
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship
from bitquery_kafka_streams_rust_ray.pipelines.oracle import run_oracle
from bitquery_kafka_streams_rust_ray.sinks.compaction import (
    read_output_compacted)
from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink
from bitquery_kafka_streams_rust_ray.state.store import IntervalJoinState
from bitquery_kafka_streams_rust_ray.stages.timeops import US

pytestmark = pytest.mark.usefixtures("ray_session")


def _add(st, key, rows):
    """rows: [(ts_seconds, url)]"""
    st.add([key] * len(rows), [r[1] for r in rows],
           np.array([r[0] * US for r in rows], dtype=np.int64))


def test_pairs_within_bound_both_directions():
    st = IntervalJoinState(10 * US)
    _add(st, "h", [(0, "a")])
    _add(st, "h", [(7, "b")])     # later event time
    _add(st, "h", [(3, "c")])     # earlier than b, pairs with both
    _add(st, "h", [(20, "d")])    # within 10 of nothing... except b? 20-7=13 no
    got = st.close(0)
    assert got == [
        ("h", "a", 0, "b", 7 * US),
        ("h", "a", 0, "c", 3 * US),
        ("h", "c", 3 * US, "b", 7 * US),
    ]


def test_same_batch_rows_pair_and_key_isolation():
    st = IntervalJoinState(10 * US)
    _add(st, "h", [(5, "x"), (1, "y")])  # same batch, unordered input
    _add(st, "g", [(2, "z")])            # other key: no cross pairs
    assert st.close(0) == [("h", "y", 1 * US, "x", 5 * US)]


def test_eviction_boundary_is_exact():
    st = IntervalJoinState(10 * US)
    _add(st, "h", [(0, "a")])
    st.close(10 * US)   # horizon = 0: ts 0 kept (future row at ts=10 can pair)
    _add(st, "h", [(10, "b")])
    assert st.close(0) == [("h", "a", 0, "b", 10 * US)]
    # now watermark 21: horizon 11 > ts(b)=10 -> b evicted
    st.close(21 * US)
    _add(st, "h", [(21, "c")])  # 21-10=11 > bound anyway: no pair lost
    assert st.close(0) == []
    assert st.size() == 1  # only c buffered


def test_epoch_layout_invariance_and_snapshot():
    events = [(0, "a"), (4, "b"), (9, "c"), (13, "d"), (30, "e"), (33, "f")]
    one = IntervalJoinState(10 * US)
    _add(one, "h", events)
    want = one.close(10 ** 18)

    many = IntervalJoinState(10 * US)
    got = []
    for i, e in enumerate(events):  # one event per epoch + restore
        _add(many, "h", [e])
        got.extend(many.close((e[0] + 1) * US))
        many = IntervalJoinState.restore(many.snapshot())
    got.extend(many.close(10 ** 18))
    assert sorted(got) == want


CFG_IV = EngineConfig(min_text_len=1, state_shards=4,
                      extract_concurrency=2, files_per_epoch=2,
                      interval_join_s=60)


def test_interval_join_matches_oracle_and_batch_truth(tmp_path):
    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec, generate_host_metadata, generate_pages)

    d = str(tmp_path / "pages")
    spec = PagesSpec(num_rows=2_000, seed=42)
    generate_pages(d, spec)
    generate_host_metadata(d, spec)
    out = str(tmp_path / "out")
    summary = run_flagship(d, out, config=CFG_IV)
    meta = pq.read_table(
        os.path.join(d, "host_metadata.parquet")).to_pandas()
    oracle = run_oracle(d, CFG_IV, PageFilter(min_text_len=1), meta)

    c = summary["metrics"]["counters"]
    assert c["interval_pairs_emitted"] == len(oracle["copage_pairs"]) > 0

    sink = EpochSink(out)
    got = read_output_compacted(sink, "copage_pairs").to_pandas()
    rows = oracle["copage_pairs"]
    want = pd.DataFrame({
        "host": [r[1] for r in rows],
        "url_a": [r[2] for r in rows],
        "ts_a": pd.to_datetime([r[3] for r in rows], unit="us"),
        "url_b": [r[4] for r in rows],
        "ts_b": pd.to_datetime([r[5] for r in rows], unit="us"),
    })
    sort = ["host", "url_a", "ts_a", "url_b", "ts_b"]
    for df in (got, want):
        for col in ("ts_a", "ts_b"):
            df[col] = df[col].astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        got.sort_values(sort).reset_index(drop=True),
        want.sort_values(sort).reset_index(drop=True),
        check_dtype=False, obj="copage_pairs")

    # batch truth: the pair set equals an all-pairs self-join over the
    # committed SURVIVING pages (dedup already applied), host != ''
    pages = read_output_compacted(sink, "pages").to_pandas()
    pages = pages[pages["host"] != ""]
    ts = pages["warc_ts"].astype("datetime64[us]").astype("int64")
    frame = pd.DataFrame({"host": pages["host"], "url": pages["url"],
                          "ts": ts})
    truth = set()
    for host, g in frame.groupby("host"):
        rows_ = sorted(zip(g["ts"], g["url"]))
        for i in range(len(rows_)):
            for j in range(i + 1, len(rows_)):
                if rows_[j][0] - rows_[i][0] <= 60 * US:
                    truth.add((host, rows_[i][1], rows_[i][0],
                               rows_[j][1], rows_[j][0]))
    got_set = {
        (r.host, r.url_a, int(pd.Timestamp(r.ts_a).value // 1000),
         r.url_b, int(pd.Timestamp(r.ts_b).value // 1000))
        for r in got.itertuples()
    }
    assert got_set == truth
