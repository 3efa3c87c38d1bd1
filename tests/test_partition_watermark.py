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
    """update_mode + early_fire + per_partition_watermark + CEP veto +
    funnel timeouts together: the single-process oracle replays the
    combined semantics and every counter and correction row must match
    (feature interactions are where trigger bugs hide)."""
    import pyarrow.parquet as pq

    from bitquery_kafka_streams_rust_ray.sinks.compaction import read_output_compacted
    from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink
    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec, generate_host_metadata, generate_pages)

    d = str(tmp_path / "pages_combined")
    spec = PagesSpec(num_rows=2_000, very_late_frac=0.05, seed=11)
    generate_pages(d, spec)
    generate_host_metadata(d, spec)
    from bitquery_kafka_streams_rust_ray.config import FunnelConfig

    cfg = EngineConfig(min_text_len=1, state_shards=4,
                       extract_concurrency=2, files_per_epoch=2,
                       update_mode=True, update_horizon_s=60,
                       early_fire=True, per_partition_watermark=True,
                       interval_join_s=60,
                       funnel=FunnelConfig(veto_min_len=470,
                                           emit_timeouts=True))
    out = str(tmp_path / "combined_out")
    summary = run_flagship(d, out, config=cfg)
    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    oracle = run_oracle(d, cfg, PageFilter(min_text_len=1), meta)

    c = {k: int(v) for k, v in summary["metrics"]["counters"].items()
         if k not in ("windows_emitted", "windows_updated",
                      "sessions_updated", "interval_pairs_emitted")}
    assert c == oracle["counters"], f"{c} != {oracle['counters']}"
    assert c["late_accepted"] > 0

    sink = EpochSink(out)
    upd = read_output_compacted(sink, "window_updates").to_pandas()
    want_upd = oracle["window_updates"]
    assert len(upd) == len(want_upd)
    early = read_output_compacted(sink, "window_early").to_pandas()
    assert len(early) == len(oracle["window_early"])
    searly = read_output_compacted(sink, "session_early").to_pandas()
    assert len(searly) == len(oracle["session_early"])
    fto = read_output_compacted(sink, "funnel_timeouts").to_pandas()
    assert len(fto) == len(oracle["funnel_timeouts"]) > 0
    assert c["funnels_vetoed"] > 0
    pairs = read_output_compacted(sink, "copage_pairs").to_pandas()
    assert len(pairs) == len(oracle["copage_pairs"]) > 0


def test_tracker_idleness_excludes_and_never_regresses():
    """Epoch-counted idleness: a partition absent for idle_epochs
    consecutive epochs leaves the min-combine; its reappearance with a
    stale max never regresses the emitted watermark (floor)."""
    t = PartitionedWatermarkTracker(allowed_lateness_us=10, idle_epochs=2)
    t.observe_partition("00", 100)
    t.observe_partition("01", 50)
    t.advance_epoch({"00", "01"})
    assert t.watermark_us == 40  # min-combine: both active

    # "01" goes quiet; "00" keeps producing
    t.observe_partition("00", 200)
    t.advance_epoch({"00"})
    assert t.watermark_us == 40  # one idle epoch: still combined
    t.observe_partition("00", 300)
    t.advance_epoch({"00"})
    assert t.watermark_us == 290  # excluded: watermark tracks "00"

    # "01" reappears with its stale max: back in the combine, but the
    # emitted watermark holds at the floor instead of regressing
    t.observe_partition("01", 60)
    t.advance_epoch({"00", "01"})
    assert t.epochs_idle["01"] == 0
    assert t.max_event_ts_us == 60
    assert t.watermark_us == 290  # floored, monotone
    t.observe_partition("01", 400)
    t.observe_partition("00", 400)
    t.advance_epoch({"00", "01"})
    assert t.watermark_us == 390  # past the floor again

    # snapshot round-trips counters and floor
    t2 = PartitionedWatermarkTracker.restore(t.snapshot(), idle_epochs=2)
    assert t2.epochs_idle == t.epochs_idle
    assert t2.floor_us == t.floor_us
    assert t2.watermark_us == t.watermark_us


def test_tracker_all_idle_holds_watermark():
    t = PartitionedWatermarkTracker(allowed_lateness_us=0, idle_epochs=1)
    t.observe_partition("00", 100)
    t.observe_partition("01", 200)
    t.advance_epoch({"00", "01"})
    assert t.watermark_us == 100
    for _ in range(3):
        t.advance_epoch(set())
    # every partition idle: combine falls back to all, emission holds
    assert t.watermark_us == 100


def _truncated_shard_log(tmp_path, name):
    """Pages log where key-shard stream 3 dies after slice 1."""
    import glob

    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec, generate_host_metadata, generate_pages)

    d = str(tmp_path / name)
    spec = PagesSpec(num_rows=3_000, num_slices=6, shards=4, seed=13)
    generate_pages(d, spec)
    generate_host_metadata(d, spec)
    for f in glob.glob(os.path.join(d, "pages-*-03.parquet")):
        if int(os.path.basename(f).split("-")[1]) >= 2:
            os.remove(f)
    return d


def test_idle_partition_unpins_watermark_end_to_end(tmp_path):
    """A dead key-shard stream pins the per-epoch committed watermark
    forever under plain min-combine; with watermark_idle_epochs it is
    excluded after the configured silence and the watermark advances
    with the live streams. Kill-and-resume stays byte-identical (the
    idle counters and floor ride the checkpoint)."""
    import dataclasses

    from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink

    d = _truncated_shard_log(tmp_path, "pages_deadshard")
    cfg_off = dataclasses.replace(CFG_PART, files_per_epoch=1)
    cfg_on = dataclasses.replace(cfg_off, watermark_idle_epochs=2)

    run_flagship(d, str(tmp_path / "out_off"), config=cfg_off)
    run_flagship(d, str(tmp_path / "out_on"), config=cfg_on)

    def epoch_watermarks(out):
        sink = EpochSink(out)
        return [sink.read_manifest(e)["watermark_us"]
                for e in sink.committed_epochs()]

    wm_off = epoch_watermarks(str(tmp_path / "out_off"))
    wm_on = epoch_watermarks(str(tmp_path / "out_on"))
    # data epochs 0..5 + drain. Off: epochs 2..5 stay pinned at the
    # dead shard's frozen max. On: exclusion after 2 silent epochs
    # lets epochs 3..5 advance with the live shards.
    assert wm_off[2] == wm_off[3] == wm_off[4] == wm_off[5]
    assert wm_on[:3] == wm_off[:3]  # identical until exclusion
    assert wm_on[3] > wm_off[3]
    assert wm_on[4] > wm_on[3] and wm_on[5] > wm_on[4]
    assert wm_on == sorted(wm_on)  # monotone emission

    # kill-and-resume with idleness on: byte-identical to uninterrupted
    from bitquery_kafka_streams_rust_ray.pipelines.streaming import StreamingPagesPipeline
    from bitquery_kafka_streams_rust_ray.reliability import RetryExhausted
    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    out_resumed = str(tmp_path / "out_resumed")

    class Boom(RuntimeError):
        pass

    real_exchange = StreamingPagesPipeline._exchange_epoch

    def crashing(self, epoch, files, actors, watermark, attempt=0):
        if epoch == 4:  # after exclusion has begun
            raise Boom()
        return real_exchange(self, epoch, files, actors, watermark, attempt)

    StreamingPagesPipeline._exchange_epoch = crashing
    try:
        with pytest.raises(RetryExhausted):
            StreamingPagesPipeline(d, out_resumed, cfg_on,
                                   PageFilter(min_text_len=1), meta
                                   ).run(resume=True)
    finally:
        StreamingPagesPipeline._exchange_epoch = real_exchange
    StreamingPagesPipeline(d, out_resumed, cfg_on,
                           PageFilter(min_text_len=1), meta).run(resume=True)

    from tests.test_streaming_e2e import _output_hashes
    ref = _output_hashes(str(tmp_path / "out_on"))
    got = _output_hashes(out_resumed)
    assert set(got) == set(ref)
    diff = {k for k in ref if ref[k] != got[k]}
    assert not diff, f"resume with idleness diverged: {sorted(diff)[:10]}"
