"""Small-file compaction: byte-identical reads, bounded output sizes,
idempotency, and crash-between-manifest-and-cleanup recovery."""

import os

import pyarrow as pa
import pytest

from bitquery_kafka_streams_rust_ray.sinks import compaction
from bitquery_kafka_streams_rust_ray.sinks.compaction import (
    compact_output,
    read_output_compacted,
)
from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink

pytestmark = pytest.mark.usefixtures("ray_session")


def _table(epoch: int, shard: int, n: int = 500) -> pa.Table:
    base = epoch * 1000 + shard * 100
    return pa.table({
        "k": pa.array(range(base, base + n), type=pa.int64()),
        "v": pa.array([f"e{epoch}s{shard}r{i}" for i in range(n)]),
    })


@pytest.fixture()
def sink(tmp_path):
    s = EpochSink(str(tmp_path / "out"))
    for e in range(4):
        stage = s.stage_dir(e)
        for sh in range(3):
            import pyarrow.parquet as pq

            pq.write_table(_table(e, sh), os.path.join(stage, f"pages-{sh:02d}.parquet"))
        s.commit_epoch(e, tables={"windows": _table(e, 9, n=10)})
    return s


def test_compaction_preserves_rows_and_order(sink):
    before = sink.read_output("pages")
    manifest = compact_output(sink, "pages", target_bytes=1 << 14)
    assert manifest is not None and len(manifest["bins"]) >= 2
    after = read_output_compacted(sink, "pages")
    assert after.equals(before)
    # originals are gone once the manifest is durable
    for e in range(4):
        left = [f for f in os.listdir(sink.epoch_dir(e))
                if f.startswith("pages-")]
        assert left == []
    # the untouched sibling output still reads identically
    assert read_output_compacted(sink, "windows").equals(
        sink.read_output("windows"))


def test_compaction_bounds_file_sizes(sink):
    target = 1 << 14
    manifest = compact_output(sink, "pages", target_bytes=target)
    gen_dir = os.path.join(sink.out_dir, manifest["dir"])
    sizes = [os.path.getsize(os.path.join(gen_dir, b["file"]))
             for b in manifest["bins"]]
    # every bin holds at least one file; multi-file bins stay near target
    assert all(s <= 2 * target for s in sizes)
    assert sum(b["rows"] for b in manifest["bins"]) == 4 * 3 * 500


def test_compaction_idempotent_and_incremental(sink):
    before = sink.read_output("pages")
    assert compact_output(sink, "pages", target_bytes=1 << 20) is not None
    # nothing new: no-op
    assert compact_output(sink, "pages", target_bytes=1 << 20) is None
    # a later epoch commits; only it is compact-eligible (and alone it
    # is below the 2-file floor, so still a no-op — reads stay whole)
    stage = sink.stage_dir(4)
    import pyarrow.parquet as pq

    pq.write_table(_table(4, 0), os.path.join(stage, "pages-00.parquet"))
    pq.write_table(_table(4, 1), os.path.join(stage, "pages-01.parquet"))
    sink.commit_epoch(4)
    got = read_output_compacted(sink, "pages")
    want = pa.concat_tables([before, _table(4, 0), _table(4, 1)])
    assert got.equals(want)
    # now two uncompacted files exist -> a second generation folds them
    m2 = compact_output(sink, "pages", target_bytes=1 << 20)
    assert m2 is not None and m2["generation"] == 1
    assert read_output_compacted(sink, "pages").equals(want)


def test_crash_between_manifest_and_cleanup(sink, monkeypatch):
    before = sink.read_output("pages")
    real_cleanup = compaction._cleanup_sources
    monkeypatch.setattr(compaction, "_cleanup_sources",
                        lambda *_a, **_k: None)
    compact_output(sink, "pages", target_bytes=1 << 20)
    # crash simulated: manifest durable, sources still on disk — readers
    # must prefer the compacted generation and not double-count
    assert read_output_compacted(sink, "pages").equals(before)
    monkeypatch.setattr(compaction, "_cleanup_sources", real_cleanup)
    # next maintenance call finishes the cleanup, reads unchanged
    assert compact_output(sink, "pages", target_bytes=1 << 20) is None
    for e in range(4):
        assert [f for f in os.listdir(sink.epoch_dir(e))
                if f.startswith("pages-")] == []
    assert read_output_compacted(sink, "pages").equals(before)


def test_flagship_compact_after_drain_outputs_identical(pages_dir, tmp_path):
    """An engine run with compact_after_drain=True yields byte-identical
    read-back tables to a plain run, with the per-epoch small files
    folded into one file per output."""
    from bitquery_kafka_streams_rust_ray.config import EngineConfig
    from bitquery_kafka_streams_rust_ray.pipelines.flagship import (
        flagship_outputs,
        run_flagship,
    )

    d, _spec, _ = pages_dir
    cfg = EngineConfig(min_text_len=1, state_shards=4,
                       extract_concurrency=2, files_per_epoch=2)
    plain_out = str(tmp_path / "plain")
    run_flagship(d, plain_out, config=cfg)
    import dataclasses

    ccfg = dataclasses.replace(cfg, compact_after_drain=True,
                               compact_target_bytes=1 << 30)
    comp_out = str(tmp_path / "compacted")
    run_flagship(d, comp_out, config=ccfg)

    plain = flagship_outputs(plain_out)
    comp = flagship_outputs(comp_out)
    assert set(plain) == set(comp)
    for name in plain:
        assert comp[name].equals(plain[name]), name

    # per-epoch parquet files replaced by a single compacted file per
    # multi-file output
    sink = EpochSink(comp_out)
    for e in sink.committed_epochs():
        left = [f for f in os.listdir(sink.epoch_dir(e))
                if f.startswith("pages-") and f.endswith(".parquet")]
        assert left == []
    gen_dir = os.path.join(comp_out, "compacted", "pages-gen=000000")
    assert len(os.listdir(gen_dir)) == 1


def test_resume_after_compaction_is_noop(pages_dir, tmp_path):
    """Resuming a drained-and-compacted run over unchanged input must
    early-return from the drain manifest (the per-epoch parquet files
    are gone — only the manifest record matters) and read back the
    same tables."""
    import dataclasses

    from bitquery_kafka_streams_rust_ray.config import EngineConfig
    from bitquery_kafka_streams_rust_ray.pipelines.flagship import (
        flagship_outputs,
        run_flagship,
    )

    d, _spec, _ = pages_dir
    cfg = dataclasses.replace(
        EngineConfig(min_text_len=1, state_shards=4, extract_concurrency=2,
                     files_per_epoch=2),
        compact_after_drain=True, compact_target_bytes=1 << 30)
    out = str(tmp_path / "out")
    run_flagship(d, out, config=cfg)
    before = flagship_outputs(out)
    summary = run_flagship(d, out, config=cfg, resume=True)
    assert summary["epochs"]  # early-returned committed epochs
    after = flagship_outputs(out)
    for name in before:
        assert after[name].equals(before[name]), name
