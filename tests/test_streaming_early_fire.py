"""Early-firing speculative window previews: every epoch commit also
emits the current partial result of each still-open tumbling/sliding
window into ``window_early`` (tagged with the emitting epoch). Previews
are monotone per window and superseded by the final on-time emission."""

import os

import pandas as pd
import pytest

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.functions.filters import PageFilter
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship
from bitquery_kafka_streams_rust_ray.pipelines.oracle import run_oracle
from bitquery_kafka_streams_rust_ray.sinks.compaction import read_output_compacted
from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink

pytestmark = pytest.mark.usefixtures("ray_session")

CFG_EARLY = EngineConfig(min_text_len=1, state_shards=4,
                         extract_concurrency=2, files_per_epoch=2,
                         early_fire=True)


@pytest.fixture(scope="module")
def early_run(pages_dir, tmp_path_factory):
    d, spec, _ = pages_dir
    out = str(tmp_path_factory.mktemp("early_out"))
    summary = run_flagship(d, out, config=CFG_EARLY)
    return d, out, summary


def _norm(df, sort_cols):
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def test_early_fire_matches_oracle(early_run):
    import pyarrow.parquet as pq

    d, out, _ = early_run
    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    oracle = run_oracle(d, CFG_EARLY, PageFilter(min_text_len=1), meta)

    sink = EpochSink(out)
    got = read_output_compacted(sink, "window_early").to_pandas()
    rows = oracle["window_early"]
    want = pd.DataFrame({
        "epoch": [r[0] for r in rows],
        "kind": [r[1] for r in rows],
        "key": [r[2] for r in rows],
        "window_start": pd.to_datetime([r[3] for r in rows], unit="us"),
        "window_end": pd.to_datetime([r[4] for r in rows], unit="us"),
        "doc_count": [r[5] for r in rows],
        "total_chars": [float(r[6]) for r in rows],
    })
    assert len(got) > 0, "early firing produced no previews"
    sort = ["epoch", "kind", "key", "window_start"]
    pd.testing.assert_frame_equal(
        _norm(got, sort), _norm(want, sort), check_dtype=False,
        obj="window_early")

    # previews are monotone: for a given window, doc_count never shrinks
    # across emitting epochs
    g = got.sort_values("epoch").groupby(["kind", "key", "window_start"])
    assert all(s.is_monotonic_increasing for _, s in g["doc_count"]), \
        "a preview shrank across epochs"

    # supersession: after the drain every previewed window has a final
    # emission, and the final count >= the last preview
    final = read_output_compacted(sink, "tumbling_lang").to_pandas()
    tum = got[got["kind"] == "tumbling:lang"]
    last = tum.sort_values("epoch").groupby(
        ["key", "window_start"], as_index=False).last()
    merged = last.merge(final, on=["key", "window_start"],
                        suffixes=("_early", "_final"))
    assert len(merged) == len(last), "a previewed window never finalized"
    assert (merged["doc_count_final"] >= merged["doc_count_early"]).all()

    # base outputs (final windows) are unaffected by early firing
    base_oracle = [r for r in oracle["windows"] if r[1] == "tumbling:lang"]
    w = _norm(pd.DataFrame({
        "key": [r[2] for r in base_oracle],
        "window_start": pd.to_datetime([r[3] for r in base_oracle],
                                       unit="us"),
        "window_end": pd.to_datetime([r[4] for r in base_oracle],
                                     unit="us"),
        "doc_count": [r[5] for r in base_oracle],
        "total_chars": [float(r[6]) for r in base_oracle],
    }), ["key", "window_start"])
    pd.testing.assert_frame_equal(
        _norm(final, ["key", "window_start"]), w, check_dtype=False,
        obj="tumbling_lang under early_fire")


def test_session_early_previews_match_oracle(early_run):
    import pyarrow.parquet as pq

    d, out, _ = early_run
    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    oracle = run_oracle(d, CFG_EARLY, PageFilter(min_text_len=1), meta)

    sink = EpochSink(out)
    got = read_output_compacted(sink, "session_early").to_pandas()
    rows = oracle["session_early"]
    want = pd.DataFrame({
        "epoch": [r[0] for r in rows],
        "host": [r[1] for r in rows],
        "session_start": pd.to_datetime([r[2] for r in rows], unit="us"),
        "session_end": pd.to_datetime([r[3] for r in rows], unit="us"),
        "doc_count": [r[4] for r in rows],
        "total_chars": [float(r[5]) for r in rows],
    })
    assert len(got) > 0, "early firing produced no session previews"
    sort = ["epoch", "host", "session_start"]
    pd.testing.assert_frame_equal(
        _norm(got, sort), _norm(want, sort), check_dtype=False,
        obj="session_early")

    # supersession by CONTAINMENT: every preview is inside exactly one
    # final emitted session of the same host, with count no larger than
    # the final's (a bridging event can move start earlier, so key
    # equality would be the wrong check)
    final = read_output_compacted(sink, "session_host").to_pandas()
    by_host = {h: g for h, g in final.groupby("host")}
    for r in got.itertuples():
        fg = by_host.get(r.host)
        assert fg is not None, f"previewed host {r.host} never finalized"
        hit = fg[(fg["session_start"] <= r.session_start)
                 & (fg["session_end"] >= r.session_end)]
        assert len(hit) == 1, (
            f"preview {r.host} [{r.session_start}, {r.session_end}) is "
            f"contained in {len(hit)} final sessions, want exactly 1")
        assert int(hit["doc_count"].iloc[0]) >= r.doc_count
