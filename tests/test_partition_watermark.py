"""Per-partition watermarks (Kafka/Flink min-combine): one watermark
per key-shard file stream, global watermark = min across partitions —
a lagging partition holds the pipeline back instead of having its rows
declared late. Partition maxes come from parquet footer statistics
(plan-time metastore scan), mirrored exactly by the oracle."""

import os

import pandas as pd
import pytest

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.functions.filters import PageFilter
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship
from bitquery_kafka_streams_rust_ray.pipelines.oracle import run_oracle
from bitquery_kafka_streams_rust_ray.state.watermark import (
    PartitionedWatermarkTracker)

pytestmark = pytest.mark.usefixtures("ray_session")

CFG_PART = EngineConfig(min_text_len=1, state_shards=4,
                        extract_concurrency=2, files_per_epoch=2,
                        per_partition_watermark=True)
CFG_GLOBAL = EngineConfig(min_text_len=1, state_shards=4,
                          extract_concurrency=2, files_per_epoch=2)


def test_tracker_min_combine_and_drain_base():
    t = PartitionedWatermarkTracker(allowed_lateness_us=10)
    assert t.watermark_us < -(1 << 61)  # empty: effectively -inf
    t.observe_partition("00", 100)
    t.observe_partition("01", 50)
    assert t.max_event_ts_us == 50  # min-combine
    assert t.watermark_us == 40
    assert t.drain_base_us == 100   # drain jumps from the GLOBAL max
    t.observe_partition("01", 200)
    assert t.max_event_ts_us == 100
    t.observe(500)                   # global jump raises every partition
    assert t.max_event_ts_us == 500

    t2 = PartitionedWatermarkTracker.restore(t.snapshot())
    assert t2.max_per_partition == t.max_per_partition
    assert t2.watermark_us == t.watermark_us


def test_partitioned_engine_matches_oracle(pages_dir, tmp_path):
    import pyarrow.parquet as pq

    d, _, _ = pages_dir
    out = str(tmp_path / "part_wm_out")
    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    summary = run_flagship(d, out, config=CFG_PART)
    oracle = run_oracle(d, CFG_PART, PageFilter(min_text_len=1), meta)

    c = {k: int(v) for k, v in summary["metrics"]["counters"].items()
         if k != "windows_emitted"}
    assert c == oracle["counters"], f"{c} != {oracle['counters']}"

    from bitquery_kafka_streams_rust_ray.sinks.compaction import read_output_compacted
    from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink

    sink = EpochSink(out)
    got = (read_output_compacted(sink, "tumbling_lang").to_pandas()
           .sort_values(["key", "window_start"]).reset_index(drop=True))
    rows = [r for r in oracle["windows"] if r[1] == "tumbling:lang"]
    want = pd.DataFrame({
        "key": [r[2] for r in rows],
        "window_start": pd.to_datetime([r[3] for r in rows], unit="us"),
        "window_end": pd.to_datetime([r[4] for r in rows], unit="us"),
        "doc_count": [r[5] for r in rows],
        "total_chars": [float(r[6]) for r in rows],
    }).sort_values(["key", "window_start"]).reset_index(drop=True)
    for c_ in got.columns:
        if pd.api.types.is_datetime64_any_dtype(got[c_]):
            got[c_] = got[c_].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_min_combine_never_drops_more_than_global(tmp_path):
    """The per-partition watermark is <= the global one at every epoch,
    so late_dropped can only shrink; on the heavy very-late fixture it
    strictly shrinks (the lagging rows fall back inside the hold-back
    watermark)."""
    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec, generate_host_metadata, generate_pages)

    d = str(tmp_path / "pages_skew")
    spec = PagesSpec(num_rows=2_000, very_late_frac=0.05, seed=7)
    generate_pages(d, spec)
    generate_host_metadata(d, spec)

    s_glob = run_flagship(d, str(tmp_path / "out_g"), config=CFG_GLOBAL)
    s_part = run_flagship(d, str(tmp_path / "out_p"), config=CFG_PART)
    late_g = int(s_glob["metrics"]["counters"]["late_dropped"])
    late_p = int(s_part["metrics"]["counters"]["late_dropped"])
    assert late_p <= late_g
    assert late_g > 0
    assert late_p < late_g, (late_p, late_g)
    # conservation: every row lands in exactly one bucket either way
    for s in (s_glob, s_part):
        c = s["metrics"]["counters"]
        assert (c["rows_written"] + c["rows_deduped"] + c["late_dropped"]
                + c["parse_errors"] + c["rows_filtered_out"]
                == c["rows_read"])


def test_all_features_combined_matches_oracle(tmp_path):
    """update_mode + early_fire + per_partition_watermark together:
    the single-process oracle replays the combined semantics and every
    counter and correction row must match (feature interactions are
    where trigger bugs hide)."""
    import pyarrow.parquet as pq

    from bitquery_kafka_streams_rust_ray.sinks.compaction import read_output_compacted
    from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink
    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec, generate_host_metadata, generate_pages)

    d = str(tmp_path / "pages_combined")
    spec = PagesSpec(num_rows=2_000, very_late_frac=0.05, seed=11)
    generate_pages(d, spec)
    generate_host_metadata(d, spec)
    cfg = EngineConfig(min_text_len=1, state_shards=4,
                       extract_concurrency=2, files_per_epoch=2,
                       update_mode=True, update_horizon_s=60,
                       early_fire=True, per_partition_watermark=True)
    out = str(tmp_path / "combined_out")
    summary = run_flagship(d, out, config=cfg)
    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    oracle = run_oracle(d, cfg, PageFilter(min_text_len=1), meta)

    c = {k: int(v) for k, v in summary["metrics"]["counters"].items()
         if k not in ("windows_emitted", "windows_updated")}
    assert c == oracle["counters"], f"{c} != {oracle['counters']}"
    assert c["late_accepted"] > 0

    sink = EpochSink(out)
    upd = read_output_compacted(sink, "window_updates").to_pandas()
    want_upd = oracle["window_updates"]
    assert len(upd) == len(want_upd)
    early = read_output_compacted(sink, "window_early").to_pandas()
    assert len(early) == len(oracle["window_early"])
