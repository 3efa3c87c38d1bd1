"""End-to-end streaming pipeline vs the single-process oracle, plus
kill-and-resume equivalence (no duplication, no loss, identical bytes)."""

import hashlib
import os

import numpy as np
import pandas as pd
import pytest

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.functions.filters import PageFilter
from bitquery_kafka_streams_rust_ray.pipelines.flagship import flagship_outputs, run_flagship
from bitquery_kafka_streams_rust_ray.pipelines.oracle import run_oracle
from bitquery_kafka_streams_rust_ray.pipelines.streaming import StreamingPagesPipeline
from bitquery_kafka_streams_rust_ray.reliability import RetryExhausted
from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink

pytestmark = pytest.mark.usefixtures("ray_session")

CFG = EngineConfig(min_text_len=1, state_shards=4, extract_concurrency=2,
                   files_per_epoch=2)


@pytest.fixture(scope="module")
def flagship_run(pages_dir, tmp_path_factory):
    d, spec, _ = pages_dir
    out = str(tmp_path_factory.mktemp("flagship_out"))
    summary = run_flagship(d, out, config=CFG)
    return d, out, summary


def norm(df: pd.DataFrame, sort_cols) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def test_pipeline_matches_oracle(flagship_run, pages_dir):
    d, out, summary = flagship_run
    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    oracle = run_oracle(d, CFG, PageFilter(min_text_len=1), meta)
    got = flagship_outputs(out)

    # --- counters
    c = {k: int(v) for k, v in summary["metrics"]["counters"].items()
         if k != "windows_emitted"}
    assert c == oracle["counters"], f"{c} != {oracle['counters']}"

    # --- surviving pages: identical rows (url, ts, text byte-identical)
    got_pages = norm(got["pages"].to_pandas(), ["url", "warc_ts"])
    want_pages = norm(oracle["pages"].drop(columns=["_epoch"]),
                     ["url", "warc_ts"])
    assert len(got_pages) == len(want_pages)
    for col in ["url", "warc_ts", "lang", "host", "text", "text_len",
                "category", "weight"]:
        pd.testing.assert_series_equal(
            got_pages[col], want_pages[col], check_names=False,
            check_dtype=False, obj=col,
        )

    # --- window results
    for name, kind in (("tumbling_lang", "tumbling:lang"),
                       ("sliding_lang", "sliding:lang")):
        g = norm(got[name].to_pandas(), ["key", "window_start"])
        rows = [r for r in oracle["windows"] if r[1] == kind]
        w = pd.DataFrame(
            {
                "key": [r[2] for r in rows],
                "window_start": pd.to_datetime([r[3] for r in rows], unit="us"),
                "window_end": pd.to_datetime([r[4] for r in rows], unit="us"),
                "doc_count": [r[5] for r in rows],
                "total_chars": [float(r[6]) for r in rows],
            }
        )
        w = norm(w, ["key", "window_start"])
        pd.testing.assert_frame_equal(g, w, check_dtype=False, obj=name)

    s = norm(got["session_host"].to_pandas(), ["host", "session_start"])
    rows = oracle["sessions"]
    w = pd.DataFrame(
        {
            "host": [r[1] for r in rows],
            "session_start": pd.to_datetime([r[2] for r in rows], unit="us"),
            "session_end": pd.to_datetime([r[3] for r in rows], unit="us"),
            "doc_count": [r[4] for r in rows],
            "total_chars": [float(r[5]) for r in rows],
        }
    )
    pd.testing.assert_frame_equal(
        s, norm(w, ["host", "session_start"]), check_dtype=False,
        obj="session_host",
    )

    # --- CEP funnel matches (exactly-once, one per matching host)
    f = norm(got["funnel_host"].to_pandas(), ["host"])
    rows = oracle["funnels"]
    w = pd.DataFrame(
        {
            "host": [r[1] for r in rows],
            "start_ts": pd.to_datetime([r[2] for r in rows], unit="us"),
            "end_ts": pd.to_datetime([r[3] for r in rows], unit="us"),
        }
    )
    assert len(f) > 0, "funnel fixture produced no matches"
    assert f["host"].is_unique
    pd.testing.assert_frame_equal(
        f, norm(w, ["host"]), check_dtype=False, obj="funnel_host",
    )

    # --- running top-k leaderboard (re-emitted every epoch, exact)
    tk = norm(got["topk_host"].to_pandas(), ["epoch", "rank"])
    rows = oracle["topk"]
    w = pd.DataFrame(
        {
            "epoch": [r[0] for r in rows],
            "rank": [r[1] for r in rows],
            "host": [r[2] for r in rows],
            "doc_count": [r[3] for r in rows],
        }
    )
    assert len(tk) > 0, "topk fixture produced no rows"
    pd.testing.assert_frame_equal(
        tk, norm(w, ["epoch", "rank"]), check_dtype=False, obj="topk_host",
    )

    # --- dead-letter quarantine (F7/F8 poison pills surface, not vanish)
    qt = norm(got["quarantine"].to_pandas(), ["url", "warc_ts"])
    rows = oracle["quarantine"]
    w = pd.DataFrame(
        {
            "url": [r[1] for r in rows],
            "warc_ts": pd.to_datetime([r[2] for r in rows]),
            "reason": [r[3] for r in rows],
        }
    )
    assert len(qt) > 0, "quarantine fixture produced no rows"
    assert len(qt) == c["parse_errors"]
    pd.testing.assert_frame_equal(
        qt, norm(w, ["url", "warc_ts"]), check_dtype=False, obj="quarantine",
    )


def test_dedup_fixtures_end_to_end(flagship_run):
    _, out, _ = flagship_run
    pages = flagship_outputs(out)["pages"].to_pandas()
    within = pages[pages["url"].str.contains("/fixtures/dup-within/0")]
    outside = pages[pages["url"].str.contains("/fixtures/dup-outside/0")]
    assert len(within) == 1  # second occurrence inside window dropped
    assert len(outside) == 2  # outside window, both survive


def test_session_fixture_end_to_end(flagship_run):
    _, out, _ = flagship_run
    s = flagship_outputs(out)["session_host"].to_pandas()
    s = s[s["host"] == "session.example.com"].sort_values("session_start")
    assert s["doc_count"].tolist() == [4, 4, 4]


def test_byte_identical_text_per_url(flagship_run, pages_dir):
    d, out, _ = flagship_run
    import glob

    import pyarrow.parquet as pq

    src = pd.concat(
        [pq.read_table(p, columns=["url", "warc_ts", "text"]).to_pandas()
         for p in sorted(glob.glob(os.path.join(d, "pages-*.parquet")))]
    )
    got = flagship_outputs(out)["pages"].to_pandas()[["url", "warc_ts", "text"]]
    merged = got.merge(src, on=["url", "warc_ts"], how="left",
                       suffixes=("", "_expected"))
    assert merged["text"].eq(merged["text_expected"]).all()


def _output_hashes(out_dir: str) -> dict[str, str]:
    hashes = {}
    for root, _dirs, files in os.walk(out_dir):
        # _tmp is staging; _observability is wall-clock telemetry
        # (health reports / timing histograms) explicitly outside the
        # byte-identity contract
        if "_tmp" in root or "_observability" in root:
            continue
        for f in files:
            p = os.path.join(root, f)
            rel = os.path.relpath(p, out_dir)
            with open(p, "rb") as fh:
                hashes[rel] = hashlib.sha256(fh.read()).hexdigest()
    return hashes


def test_kill_and_resume_byte_identical(pages_dir, tmp_path, flagship_run):
    """Crash after epoch 1 commit, resume, compare every committed byte
    against the uninterrupted reference run."""
    d, _, _ = flagship_run
    _, ref_out, _ = flagship_run
    out = str(tmp_path / "resumed_out")

    class Boom(RuntimeError):
        pass

    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()

    def make_pipe():
        return StreamingPagesPipeline(
            d, out, CFG, PageFilter(min_text_len=1), meta
        )

    pipe = make_pipe()
    real_exchange = StreamingPagesPipeline._exchange_epoch

    def crashing(self, epoch, files, actors, watermark, attempt=0):
        if epoch == 2:
            raise Boom()
        return real_exchange(self, epoch, files, actors, watermark, attempt)

    StreamingPagesPipeline._exchange_epoch = crashing
    try:
        # a persistent epoch-2 failure burns the whole replay budget,
        # then surfaces as RetryExhausted with the original cause
        with pytest.raises(RetryExhausted) as exc_info:
            pipe.run(resume=True)
        assert isinstance(exc_info.value.last_error, Boom)
    finally:
        StreamingPagesPipeline._exchange_epoch = real_exchange

    assert EpochSink(out).committed_epochs() == [0, 1]

    # fresh process analog: new pipeline object, new actors, resume
    summary = make_pipe().run(resume=True)
    assert len(summary["epochs"]) > 2

    ref_hashes = _output_hashes(ref_out)
    got_hashes = _output_hashes(out)
    assert set(got_hashes) == set(ref_hashes)
    diff = {k for k in ref_hashes
            if ref_hashes[k] != got_hashes[k] and not k.startswith("_manifests")}
    # parquet bytes must match exactly; manifests differ only in counters
    # of the epochs the resumed run never re-executed? No - they must
    # match too, since counters are per-epoch.
    assert not diff, f"differing files after resume: {sorted(diff)[:10]}"


def test_transient_exchange_failure_replays_in_run(pages_dir, tmp_path,
                                                   flagship_run):
    """A one-off exchange failure mid-run (task error analog) triggers the
    drop-buffers-and-replay path; final output matches the clean run."""
    d, ref_out, _ = flagship_run
    out = str(tmp_path / "replay_out")

    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    pipe = StreamingPagesPipeline(d, out, CFG, PageFilter(min_text_len=1), meta)

    real_exchange = StreamingPagesPipeline._exchange_epoch
    tripped = {"n": 0}

    def flaky(self, epoch, files, actors, watermark, attempt=0):
        # fail epoch 1's first attempt AFTER some rows were pushed, so
        # the replay path must actually clear partial buffers
        if epoch == 1 and tripped["n"] == 0:
            tripped["n"] += 1
            real_exchange(self, epoch, files, actors, watermark, attempt)
            raise RuntimeError("injected transient failure")
        return real_exchange(self, epoch, files, actors, watermark, attempt)

    StreamingPagesPipeline._exchange_epoch = flaky
    try:
        pipe.run(resume=False)
    finally:
        StreamingPagesPipeline._exchange_epoch = real_exchange
    assert tripped["n"] == 1

    ref_hashes = _output_hashes(ref_out)
    got_hashes = _output_hashes(out)
    assert set(got_hashes) == set(ref_hashes)
    diff = {k for k in ref_hashes if ref_hashes[k] != got_hashes[k]}
    assert not diff, f"differing files after in-run replay: {sorted(diff)[:10]}"


def test_output_independent_of_physical_config(pages_dir, tmp_path,
                                               flagship_run):
    """Cluster-layout determinism: different batch sizes / block counts
    (the single-node analog of a different cluster size) must produce
    byte-identical committed output, state snapshots included."""
    d, ref_out, _ = flagship_run

    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    out = str(tmp_path / "alt_cfg_out")
    alt = EngineConfig(min_text_len=1, state_shards=CFG.state_shards,
                       files_per_epoch=CFG.files_per_epoch,
                       read_batch_size=2048, batch_size=4096,
                       read_num_blocks=3)
    StreamingPagesPipeline(d, out, alt, PageFilter(min_text_len=1),
                           meta).run(resume=False)

    ref_hashes = _output_hashes(ref_out)
    got_hashes = _output_hashes(out)
    assert set(got_hashes) == set(ref_hashes)
    diff = {k for k in ref_hashes if ref_hashes[k] != got_hashes[k]}
    assert not diff, f"physical config leaked into output: {sorted(diff)[:10]}"


def test_overlap_commit_off_byte_identical(pages_dir, tmp_path,
                                           flagship_run):
    """The commit-tail/exchange overlap (overlap_commit, default on in
    the reference run) is pure scheduling: turning it OFF must produce
    byte-identical committed output, state snapshots included."""
    d, ref_out, _ = flagship_run

    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    out = str(tmp_path / "no_overlap_out")
    alt = EngineConfig(min_text_len=1, state_shards=CFG.state_shards,
                       files_per_epoch=CFG.files_per_epoch,
                       overlap_commit=False)
    StreamingPagesPipeline(d, out, alt, PageFilter(min_text_len=1),
                           meta).run(resume=False)

    ref_hashes = _output_hashes(ref_out)
    got_hashes = _output_hashes(out)
    assert set(got_hashes) == set(ref_hashes)
    diff = {k for k in ref_hashes if ref_hashes[k] != got_hashes[k]}
    assert not diff, f"overlap scheduling leaked into output: {sorted(diff)[:10]}"


def test_stream_stream_metadata_join_matches_oracle(pages_dir, tmp_path):
    """Slow side arriving as a stream (epoch-sliced metadata versions):
    rows join as-of against only the versions that have ARRIVED; the
    distributed engine matches the single-process oracle, and the result
    differs from a static all-upfront join (arrival semantics matter)."""
    d, _, _ = pages_dir

    import pyarrow.parquet as pq

    from bitquery_kafka_streams_rust_ray.pipelines.oracle import run_oracle

    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    meta = meta.sort_values("updated_ts", kind="mergesort").reset_index(drop=True)
    cut = len(meta) // 2
    slices = {0: meta.iloc[:cut], 2: meta.iloc[cut:]}

    out = str(tmp_path / "ss_join_out")
    pipe = StreamingPagesPipeline(
        d, out, CFG, PageFilter(min_text_len=1),
        host_metadata=None, metadata_slices=slices,
    )
    pipe.run(resume=False)
    got = norm(flagship_outputs(out)["pages"].to_pandas(), ["url", "warc_ts"])

    oracle = run_oracle(d, CFG, PageFilter(min_text_len=1),
                        host_metadata=None, metadata_slices=slices)
    want = norm(oracle["pages"].drop(columns=["_epoch"]), ["url", "warc_ts"])
    assert len(got) == len(want)
    for col in ["url", "warc_ts", "category", "weight"]:
        pd.testing.assert_series_equal(
            got[col], want[col], check_names=False, check_dtype=False, obj=col,
        )

    # static join (everything known upfront) must differ: epoch-0/1 rows
    # in the streamed variant cannot see versions that arrive at epoch 2
    static = run_oracle(d, CFG, PageFilter(min_text_len=1), host_metadata=meta)
    sw = norm(static["pages"].drop(columns=["_epoch"]), ["url", "warc_ts"])
    assert not got["category"].reset_index(drop=True).equals(
        sw["category"].reset_index(drop=True)
    )


def _shard_invariant_hashes(out_dir: str) -> dict[str, str]:
    """Output hashes restricted to shard-layout-invariant files: the
    driver-sorted window/session/funnel/topk tables and blobs. Pages /
    quarantine parquet and state pickles are per-shard (layout changes
    under rescale; the logical union is compared separately)."""
    skip = ("pages-", "quarantine-", "state-", "state.pkl",
            "copage_pairs-")
    return {k: v for k, v in _output_hashes(out_dir).items()
            if not os.path.basename(k).startswith(skip)
            and "_manifests" not in k}  # inventory per-shard file names


def _pages_union(out_dir: str) -> pd.DataFrame:
    import glob

    import pyarrow.parquet as pq

    frames = []
    for p in sorted(glob.glob(os.path.join(out_dir, "epoch=*",
                                           "pages-*.parquet"))):
        df = pq.read_table(p).to_pandas()
        df["_epoch"] = os.path.basename(os.path.dirname(p))
        frames.append(df)
    return (pd.concat(frames, ignore_index=True)
            .sort_values(["_epoch", "url", "warc_ts"], kind="mergesort")
            .reset_index(drop=True))


@pytest.mark.parametrize("spill", [False, True])
def test_resume_rescales_shard_count(pages_dir, tmp_path, flagship_run,
                                     spill):
    """Cluster resize (the N -> 4N path): crash mid-run, resume with a
    DIFFERENT state_shards. The checkpointed keyed state repartitions
    across the new shard count and the logical output is identical to
    the uninterrupted same-shard reference — windows/sessions/funnels/
    top-k byte-identical, the per-epoch union of page rows equal, and
    per-epoch counters equal. Only the per-shard page-file layout moves.
    The spill variant streams the dedup B-tree sidecars through
    per-owner fragment sqlite files instead of splitting dicts."""
    import dataclasses

    d, ref_out, _ = flagship_run
    out = str(tmp_path / "rescaled_out")
    base_cfg = (dataclasses.replace(
        CFG, dedup_spill_dir=str(tmp_path / "spill_state"))
        if spill else CFG)

    class Boom(RuntimeError):
        pass

    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()

    pipe = StreamingPagesPipeline(d, out, base_cfg,
                                  PageFilter(min_text_len=1), meta)
    real_exchange = StreamingPagesPipeline._exchange_epoch

    def crashing(self, epoch, files, actors, watermark, attempt=0):
        if epoch == 2:
            raise Boom()
        return real_exchange(self, epoch, files, actors, watermark, attempt)

    StreamingPagesPipeline._exchange_epoch = crashing
    try:
        with pytest.raises(RetryExhausted):
            pipe.run(resume=True)
    finally:
        StreamingPagesPipeline._exchange_epoch = real_exchange
    assert EpochSink(out).committed_epochs() == [0, 1]

    # resume on a "resized cluster": 7 shards instead of 4
    rescaled = dataclasses.replace(base_cfg, state_shards=7)
    summary = StreamingPagesPipeline(
        d, out, rescaled, PageFilter(min_text_len=1), meta).run(resume=True)
    assert len(summary["epochs"]) > 2

    ref_hashes = _shard_invariant_hashes(ref_out)
    got_hashes = _shard_invariant_hashes(out)
    assert set(got_hashes) == set(ref_hashes)
    diff = {k for k in ref_hashes if ref_hashes[k] != got_hashes[k]}
    assert not diff, f"shard-invariant files differ: {sorted(diff)[:10]}"

    got_pages = _pages_union(out)
    want_pages = _pages_union(ref_out)
    assert len(got_pages) == len(want_pages)
    for col in want_pages.columns:
        assert got_pages[col].equals(want_pages[col]), col

    # per-epoch counters (rows written/deduped/filtered) are
    # shard-layout invariant too
    ref_sink, got_sink = EpochSink(ref_out), EpochSink(out)
    for e in ref_sink.committed_epochs():
        assert (got_sink.read_manifest(e)["counters"]
                == ref_sink.read_manifest(e)["counters"]), e
    # the rescale surfaced in telemetry
    assert summary["metrics"]["counters"].get("state_rescales") == 1


def test_disabled_funnel_and_topk_still_match_oracle(pages_dir,
                                                     tmp_path_factory):
    """Feature toggles: funnel off + top-k off runs clean, counters
    still match the oracle, and the disabled outputs are just absent."""
    from bitquery_kafka_streams_rust_ray.config import FunnelConfig

    d, _, _ = pages_dir
    cfg = EngineConfig(min_text_len=1, state_shards=2,
                       extract_concurrency=2, files_per_epoch=4,
                       funnel=FunnelConfig(enabled=False), topk_hosts=0)
    out = str(tmp_path_factory.mktemp("flagship_toggles_out"))
    summary = run_flagship(d, out, config=cfg)

    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    oracle = run_oracle(d, cfg, PageFilter(min_text_len=1), meta)
    c = {k: int(v) for k, v in summary["metrics"]["counters"].items()
         if k != "windows_emitted"}
    assert c == oracle["counters"]
    assert "funnels_matched" not in c
    got = flagship_outputs(out)
    assert got["funnel_host"].num_rows == 0
    assert got["topk_host"].num_rows == 0
    assert got["pages"].num_rows == oracle["counters"]["rows_written"]


def test_dedup_spill_backend_byte_identical(pages_dir, tmp_path, flagship_run):
    """The sqlite-spill dedup backend (dedup_spill_dir) commits output
    byte-identical to the dict backend's reference run — including
    across a mid-run crash + resume, which exercises restore_dedup's
    sqlite-image restore path inside the checkpoint contract."""
    import dataclasses

    d, ref_out, _ = flagship_run
    out = str(tmp_path / "spill_out")
    cfg = dataclasses.replace(
        CFG, dedup_spill_dir=str(tmp_path / "spill_state"))

    class Boom(RuntimeError):
        pass

    real_exchange = StreamingPagesPipeline._exchange_epoch

    def crashing(self, epoch, files, actors, watermark, attempt=0):
        if epoch == 2:
            raise Boom()
        return real_exchange(self, epoch, files, actors, watermark, attempt)

    StreamingPagesPipeline._exchange_epoch = crashing
    try:
        with pytest.raises(RetryExhausted):
            run_flagship(d, out, config=cfg)
    finally:
        StreamingPagesPipeline._exchange_epoch = real_exchange
    assert EpochSink(out).committed_epochs() == [0, 1]

    summary = run_flagship(d, out, config=cfg, resume=True)
    assert summary["metrics"]["counters"]["rows_read"] > 0

    # state snapshots are backend representations (sqlite image vs dict
    # pickle; the spill backend adds .dedup.sqlite sidecars that the
    # manifests inventory) — equivalent state, different bytes, proven
    # equivalent by the property tests; every DATA byte must be
    # identical and manifests must agree on everything but state files
    import json

    def data_hashes(d_):
        out_h = {}
        for k, v in _output_hashes(d_).items():
            base = os.path.basename(k)
            if base.startswith("state"):
                continue
            if k.startswith("_manifests/"):
                with open(os.path.join(d_, k)) as f:
                    m = json.load(f)
                m["outputs"] = {n: e for n, e in m["outputs"].items()
                                if not n.startswith("state")}
                v = json.dumps(m, sort_keys=True)
            out_h[k] = v
        return out_h

    assert data_hashes(out) == data_hashes(ref_out)


def test_late_rows_surface_in_quarantine_when_enabled(pages_dir, tmp_path,
                                                      flagship_run):
    """quarantine_late=True surfaces every late-dropped row as a
    committed quarantine row (reason='late'); data outputs stay
    byte-identical to the default run (late rows were never in any
    window either way)."""
    import dataclasses

    d, ref_out, ref_summary = flagship_run
    out = str(tmp_path / "late_dlq_out")
    cfg = dataclasses.replace(CFG, quarantine_late=True)
    summary = run_flagship(d, out, config=cfg, resume=False)

    q = flagship_outputs(out)["quarantine"].to_pandas()
    late = q[q["reason"] == "late"]
    assert len(late) == summary["metrics"]["counters"]["late_dropped"]
    # parse-error rows unchanged vs the reference run
    ref_q = flagship_outputs(ref_out)["quarantine"].to_pandas()
    assert (len(q[q["reason"] == "parse_error"])
            == len(ref_q[ref_q["reason"] == "parse_error"]))
    # every data output identical; only the quarantine table differs
    ref = flagship_outputs(ref_out)
    got = flagship_outputs(out)
    for name in ref:
        if name == "quarantine":
            continue
        assert got[name].to_pandas().equals(ref[name].to_pandas()), name


def test_empty_pages_log_commits_clean_empty_epoch(pages_dir, tmp_path):
    """Filter-to-zero input is routine at scale: an entirely empty
    pages log (real schema, zero rows) must run end to end, commit an
    empty epoch under the 2PC contract, and release the run lock —
    not crash on a schema-less empty block. (The analytical queries()
    surface assumes a non-empty corpus; the streaming engine is the
    path that must absorb empty input.)"""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    d, _, _ = pages_dir
    empty = str(tmp_path / "pages_empty")
    os.makedirs(empty)
    src = sorted(glob.glob(os.path.join(d, "*.parquet")))[0]
    pq.write_table(pq.read_table(src).schema.empty_table(),
                   os.path.join(empty, os.path.basename(src)))
    meta = glob.glob(os.path.join(d, "host_metadata*"))
    for m in meta:
        shutil.copy(m, empty)
    out = str(tmp_path / "empty_out")
    summary = run_flagship(empty, out, config=CFG)
    assert summary["epochs"] == [0]
    sink = EpochSink(out)
    assert sink.committed_epochs()
    assert not os.path.exists(os.path.join(out, "_lock"))


@pytest.mark.parametrize("crash_epoch", [0, 3])
def test_kill_and_resume_byte_identical_any_epoch(pages_dir, tmp_path,
                                                  flagship_run,
                                                  crash_epoch):
    """The crash point must not matter: generalize the epoch-2 pin to a
    sweep — crash before the first commit (epoch 0: resume replays the
    whole run) and near the tail (epoch 3) — byte-identity holds at
    every cut."""
    d, _, _ = flagship_run
    _, ref_out, _ = flagship_run
    out = str(tmp_path / f"resumed_out_{crash_epoch}")

    class Boom(RuntimeError):
        pass

    import pyarrow.parquet as pq

    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()

    def make_pipe():
        return StreamingPagesPipeline(
            d, out, CFG, PageFilter(min_text_len=1), meta
        )

    real_exchange = StreamingPagesPipeline._exchange_epoch

    def crashing(self, epoch, files, actors, watermark, attempt=0):
        if epoch == crash_epoch:
            raise Boom()
        return real_exchange(self, epoch, files, actors, watermark, attempt)

    StreamingPagesPipeline._exchange_epoch = crashing
    try:
        with pytest.raises(RetryExhausted):
            make_pipe().run(resume=True)
    finally:
        StreamingPagesPipeline._exchange_epoch = real_exchange

    assert EpochSink(out).committed_epochs() == list(range(crash_epoch))

    make_pipe().run(resume=True)
    ref_hashes = _output_hashes(ref_out)
    got_hashes = _output_hashes(out)
    assert set(got_hashes) == set(ref_hashes)
    diff = {k for k in ref_hashes if ref_hashes[k] != got_hashes[k]}
    assert not diff, f"differing files after resume: {sorted(diff)[:10]}"


def test_spill_dir_namespaced_by_output_dir(pages_dir, tmp_path):
    """ADVICE fix: the run lock guards out_dir but not the spill dir,
    so two pipelines sharing a literal dedup_spill_dir must not clobber
    each other's sqlite files — the effective spill path is namespaced
    by a pure function of out_dir (same out_dir -> same path, so resume
    still finds its state)."""
    import dataclasses

    spill = str(tmp_path / "shared_spill")
    cfg = dataclasses.replace(CFG, dedup_spill_dir=spill)
    p1 = StreamingPagesPipeline(pages_dir, str(tmp_path / "out_a"), cfg)
    p2 = StreamingPagesPipeline(pages_dir, str(tmp_path / "out_b"), cfg)
    p1b = StreamingPagesPipeline(pages_dir, str(tmp_path / "out_a"), cfg)
    assert p1.cfg.dedup_spill_dir != p2.cfg.dedup_spill_dir
    assert p1.cfg.dedup_spill_dir == p1b.cfg.dedup_spill_dir
    assert p1.cfg.dedup_spill_dir.startswith(spill)
    # the sentinel backends pass through untouched
    assert StreamingPagesPipeline(
        pages_dir, str(tmp_path / "out_c"),
        dataclasses.replace(CFG, dedup_spill_dir=":memory:"),
    ).cfg.dedup_spill_dir == ":memory:"


def test_sketch_distinct_commits_both_columns(pages_dir, tmp_path):
    """sketch_distinct=True: tumbling_lang gains BOTH the exact
    distinct-host companion and the HLL estimate. The exact column must
    equal an independent pandas oracle over the committed survivor
    pages; the sketch must sit within its precision bound (p=12 ->
    ~1.6% std err; linear counting is near-exact at these
    cardinalities, bound at 10%). Default runs (the whole rest of this
    suite) carry neither column."""
    import dataclasses

    d, spec, _ = pages_dir
    out = str(tmp_path / "sketch_out")
    cfg = dataclasses.replace(CFG, sketch_distinct=True)
    summary = run_flagship(d, out, config=cfg)
    got = flagship_outputs(out)
    tl = got["tumbling_lang"].to_pandas()
    assert {"distinct_hosts", "approx_hosts"} <= set(tl.columns)

    # independent oracle: distinct hosts per (lang, tumbling window)
    # over the committed survivors
    pages = got["pages"].to_pandas()
    win_us = cfg.windows.tumbling_size_s * 1_000_000
    ts_us = pages["warc_ts"].astype("datetime64[us]").astype("int64")
    want = (
        pages.assign(_w=(ts_us // win_us) * win_us,
                     _k=pages["lang"].fillna(""))
        .groupby(["_k", "_w"])["host"].nunique()
    )
    tl_ts = tl["window_start"].astype("datetime64[us]").astype("int64")
    for key, w, exact, approx in zip(tl["key"], tl_ts,
                                     tl["distinct_hosts"],
                                     tl["approx_hosts"]):
        assert exact == want.loc[(key, w)], (key, w)
        assert abs(approx - exact) <= max(1, 0.1 * exact), (key, w)

    # accuracy delta surfaces as a lineage metric
    assert "sketch_distinct_rel_err" in summary["metrics"]["histograms"]

    # default path: no sketch columns (byte-identity is pinned elsewhere)
    out2 = str(tmp_path / "plain_out")
    run_flagship(d, out2, config=CFG)
    tl2 = flagship_outputs(out2)["tumbling_lang"].to_pandas()
    assert "approx_hosts" not in tl2.columns
    assert "distinct_hosts" not in tl2.columns


def test_sketch_state_survives_kill_and_resume(pages_dir, tmp_path):
    """The new distinct-sketch state family must ride the checkpoint
    contract: crash after epoch 1 with sketch_distinct=True, resume,
    and every committed byte (including the sketch columns built from
    restored HLL registers + exact sets) matches the uninterrupted
    reference run."""
    import dataclasses

    import pyarrow.parquet as pq

    d, spec, _ = pages_dir
    cfg = dataclasses.replace(CFG, sketch_distinct=True)
    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()

    ref_out = str(tmp_path / "sketch_ref")
    StreamingPagesPipeline(
        d, ref_out, cfg, PageFilter(min_text_len=1), meta).run(resume=True)

    out = str(tmp_path / "sketch_resumed")

    class Boom(RuntimeError):
        pass

    real_exchange = StreamingPagesPipeline._exchange_epoch

    def crashing(self, epoch, files, actors, watermark, attempt=0):
        if epoch == 2:
            raise Boom()
        return real_exchange(self, epoch, files, actors, watermark, attempt)

    StreamingPagesPipeline._exchange_epoch = crashing
    try:
        with pytest.raises(RetryExhausted):
            StreamingPagesPipeline(
                d, out, cfg, PageFilter(min_text_len=1), meta
            ).run(resume=True)
    finally:
        StreamingPagesPipeline._exchange_epoch = real_exchange
    assert EpochSink(out).committed_epochs() == [0, 1]

    StreamingPagesPipeline(
        d, out, cfg, PageFilter(min_text_len=1), meta).run(resume=True)

    ref_hashes = _output_hashes(ref_out)
    got_hashes = _output_hashes(out)
    assert set(got_hashes) == set(ref_hashes)
    diff = {k for k in ref_hashes if ref_hashes[k] != got_hashes[k]}
    assert not diff, f"differing files after sketch resume: {sorted(diff)[:10]}"


def test_rescale_under_all_features_byte_identical(tmp_path):
    """Cluster resize with EVERY opt-in feature on (update-mode window
    + session corrections, early previews, per-partition watermark,
    CEP veto + timeouts, interval join): the new state families
    (retained sessions, pending changelog, funnel extensions, interval
    buffers) must repartition losslessly, so the rescaled resume's
    shard-invariant outputs are byte-equal to an uninterrupted
    same-config reference."""
    import dataclasses

    import pyarrow.parquet as pq

    from bitquery_kafka_streams_rust_ray.config import FunnelConfig
    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec, generate_host_metadata, generate_pages)

    d = str(tmp_path / "pages_allf")
    spec = PagesSpec(num_rows=2_000, very_late_frac=0.05, seed=11)
    generate_pages(d, spec)
    generate_host_metadata(d, spec)
    cfg = EngineConfig(min_text_len=1, state_shards=4,
                       extract_concurrency=2, files_per_epoch=2,
                       update_mode=True, update_horizon_s=180,
                       early_fire=True, per_partition_watermark=True,
                       interval_join_s=60,
                       funnel=FunnelConfig(veto_min_len=470,
                                           emit_timeouts=True))
    meta = pq.read_table(
        os.path.join(d, "host_metadata.parquet")).to_pandas()

    ref_out = str(tmp_path / "ref_out")
    StreamingPagesPipeline(d, ref_out, cfg, PageFilter(min_text_len=1),
                           meta).run(resume=True)

    out = str(tmp_path / "rescaled_out")

    class Boom(RuntimeError):
        pass

    real_exchange = StreamingPagesPipeline._exchange_epoch

    def crashing(self, epoch, files, actors, watermark, attempt=0):
        if epoch == 2:
            raise Boom()
        return real_exchange(self, epoch, files, actors, watermark,
                             attempt)

    StreamingPagesPipeline._exchange_epoch = crashing
    try:
        with pytest.raises(RetryExhausted):
            StreamingPagesPipeline(d, out, cfg, PageFilter(min_text_len=1),
                                   meta).run(resume=True)
    finally:
        StreamingPagesPipeline._exchange_epoch = real_exchange

    rescaled = dataclasses.replace(cfg, state_shards=7)
    summary = StreamingPagesPipeline(
        d, out, rescaled, PageFilter(min_text_len=1), meta).run(resume=True)
    assert summary["metrics"]["counters"].get("state_rescales") == 1

    ref_hashes = _shard_invariant_hashes(ref_out)
    got_hashes = _shard_invariant_hashes(out)
    assert set(got_hashes) == set(ref_hashes)
    diff = {k for k in ref_hashes if ref_hashes[k] != got_hashes[k]}
    assert not diff, f"shard-invariant files differ: {sorted(diff)[:10]}"
    # the feature outputs were actually exercised in the reference
    names = {os.path.basename(k) for k in ref_hashes}
    for must in ("window_updates.parquet", "session_updates.parquet",
                 "session_early.parquet", "funnel_timeouts.parquet"):
        assert must in names, must
    # pair files are per-shard (layout moves under rescale); the
    # LOGICAL pair set must be identical
    from bitquery_kafka_streams_rust_ray.sinks.compaction import (
        read_output_compacted)

    def pair_union(o):
        df = read_output_compacted(EpochSink(o), "copage_pairs").to_pandas()
        cols = ["host", "url_a", "ts_a", "url_b", "ts_b"]
        return (df[cols].sort_values(cols, kind="mergesort")
                .reset_index(drop=True))

    got_p, want_p = pair_union(out), pair_union(ref_out)
    assert len(want_p) > 0
    pd.testing.assert_frame_equal(got_p, want_p, check_dtype=False)
