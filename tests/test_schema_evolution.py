"""Schema evolution on the input log: newer arrival slices that GAIN
columns (producer upgraded mid-stream) must not change engine output —
the pruned read selects exactly the contract columns, so additions are
invisible. A slice that DROPS a contract column must fail loudly, not
silently emit wrong data."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.pipelines.flagship import (
    flagship_outputs, run_flagship)

pytestmark = pytest.mark.usefixtures("ray_session")

CFG = EngineConfig(min_text_len=1, state_shards=4, extract_concurrency=2,
                   files_per_epoch=2)


def _evolved_copy(src: str, dst: str, drop: str | None = None) -> None:
    """Copy the pages log; files of the LAST two slices get two extra
    columns (string + list<int>) and a shuffled column order — or, when
    ``drop`` is set, lose that column instead."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for name in sorted(os.listdir(src)):
        s, d = os.path.join(src, name), os.path.join(dst, name)
        if not name.endswith(".parquet"):
            shutil.copy(s, d)
            continue
        t = pq.read_table(s)
        sl = int(name.split("-")[1]) if name.startswith("pages-") else -1
        if name.startswith("pages-") and sl >= 6:
            if drop is not None:
                t = t.drop_columns([drop])
            else:
                n = t.num_rows
                t = t.append_column(
                    "crawler_version", pa.array(["v2"] * n, pa.string()))
                t = t.append_column(
                    "outlinks", pa.array([[1, 2]] * n,
                                         pa.list_(pa.int64())))
                t = t.select(sorted(t.column_names))  # reordered too
        pq.write_table(t, d)


def test_added_columns_are_invisible(pages_dir, tmp_path):
    d, _, _ = pages_dir
    evolved = str(tmp_path / "pages_evolved")
    _evolved_copy(d, evolved)

    out_a = str(tmp_path / "out_base")
    out_b = str(tmp_path / "out_evolved")
    run_flagship(d, out_a, config=CFG, resume=False)
    run_flagship(evolved, out_b, config=CFG, resume=False)

    got_a, got_b = flagship_outputs(out_a), flagship_outputs(out_b)
    assert set(got_a) == set(got_b)
    for name in got_a:
        assert got_a[name].equals(got_b[name]), name


def test_dropped_contract_column_fails_loudly(pages_dir, tmp_path):
    d, _, _ = pages_dir
    evolved = str(tmp_path / "pages_dropped")
    _evolved_copy(d, evolved, drop="lang")
    with pytest.raises(Exception):
        run_flagship(evolved, str(tmp_path / "out_dropped"),
                     config=CFG, resume=False)


def test_resume_refuses_changed_config(pages_dir, tmp_path):
    """Epochs committed under one semantic config must not mix with a
    resumed run under another: the manifest's config fingerprint is
    checked before any epoch replays."""
    from bitquery_kafka_streams_rust_ray.functions.filters import PageFilter
    from bitquery_kafka_streams_rust_ray.pipelines.streaming import (
        StreamingPagesPipeline)
    from bitquery_kafka_streams_rust_ray.reliability import RetryExhausted
    from bitquery_kafka_streams_rust_ray.config import WindowConfig

    d, _, _ = pages_dir
    out = str(tmp_path / "cfg_guard_out")

    class Boom(RuntimeError):
        pass

    real = StreamingPagesPipeline._exchange_epoch

    def crashing(self, epoch, files, actors, watermark, attempt=0):
        if epoch == 2:
            raise Boom()
        return real(self, epoch, files, actors, watermark, attempt)

    StreamingPagesPipeline._exchange_epoch = crashing
    try:
        with pytest.raises(RetryExhausted):
            StreamingPagesPipeline(
                d, out, CFG, PageFilter(min_text_len=1)).run(resume=True)
    finally:
        StreamingPagesPipeline._exchange_epoch = real

    # changed window size -> refuse
    changed = EngineConfig(
        min_text_len=1, state_shards=4, extract_concurrency=2,
        files_per_epoch=2,
        windows=WindowConfig(tumbling_size_s=120, sliding_size_s=240,
                             sliding_slide_s=120))
    with pytest.raises(RuntimeError, match="two\\s+contracts|contracts"):
        StreamingPagesPipeline(
            d, out, changed, PageFilter(min_text_len=1)).run(resume=True)

    # changed filter -> refuse
    changed_f = StreamingPagesPipeline(
        d, out, CFG, PageFilter(min_text_len=50))
    with pytest.raises(RuntimeError, match="contracts"):
        changed_f.run(resume=True)

    # original config -> resumes and finishes clean
    s = StreamingPagesPipeline(
        d, out, CFG, PageFilter(min_text_len=1)).run(resume=True)
    assert len(s["epochs"]) > 2
