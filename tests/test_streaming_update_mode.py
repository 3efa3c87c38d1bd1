"""Allowed-lateness UPDATE mode: rows behind the frozen watermark but
within ``update_horizon_s`` are accepted as corrections; windows that
already emitted are re-emitted in the ``window_updates`` output with a
bumped revision. Engine output is pinned against the single-process
oracle, and the default path stays byte-identical (update off)."""

import numpy as np
import pandas as pd
import pytest

from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.functions.filters import PageFilter
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship
from bitquery_kafka_streams_rust_ray.pipelines.oracle import run_oracle
from bitquery_kafka_streams_rust_ray.sinks.compaction import read_output_compacted
from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink
from bitquery_kafka_streams_rust_ray.state.store import WindowState
from bitquery_kafka_streams_rust_ray.stages.timeops import US

pytestmark = pytest.mark.usefixtures("ray_session")

# horizon 180 == the session gap: wide enough that accepted-late rows
# can land within gap of an already-emitted session (the reopen band is
# empty at horizon 60 with gap 180 — see SessionState docstring)
CFG_UPD = EngineConfig(min_text_len=1, state_shards=4,
                       extract_concurrency=2, files_per_epoch=2,
                       update_mode=True, update_horizon_s=180)


# ---------------- state-store unit semantics ----------------

def test_window_state_corrections_and_aging():
    st = WindowState(update_horizon_us=100 * US)
    st.add_partials("tumbling:x", ["a"], np.array([0]), np.array([60 * US]),
                    np.array([2]), np.array([10.0]))
    closed = st.close(60 * US)
    assert [(r[1], r[4], r[5]) for r in closed] == [("a", 2, 10.0)]
    assert st.pop_updates(60 * US) == []  # nothing dirty yet

    # late partial for the emitted window -> revision 1 with merged totals
    st.add_partials("tumbling:x", ["a"], np.array([0]), np.array([60 * US]),
                    np.array([3]), np.array([7.0]))
    upd = st.pop_updates(60 * US)
    assert upd == [("tumbling:x", "a", 0, 60 * US, 5, 17.0, 1)]
    assert st.pop_updates(60 * US) == []  # dirty flag cleared

    # a second late partial bumps the revision again
    st.add_partials("tumbling:x", ["a"], np.array([0]), np.array([60 * US]),
                    np.array([1]), np.array([1.0]))
    upd = st.pop_updates(60 * US)
    assert upd == [("tumbling:x", "a", 0, 60 * US, 6, 18.0, 2)]

    # aging: once end + horizon <= watermark the retained entry drops and
    # a later partial starts a FRESH window (first emission, revision 0)
    st.pop_updates(160 * US)
    st.add_partials("tumbling:x", ["a"], np.array([0]), np.array([60 * US]),
                    np.array([9]), np.array([9.0]))
    assert st.pop_updates(200 * US) == []
    assert ("tumbling:x", "a", 0) in st.acc


def test_window_state_update_snapshot_roundtrip():
    st = WindowState(update_horizon_us=100 * US)
    st.add_partials("t", ["a", "b"], np.array([0, 0]),
                    np.array([60 * US, 60 * US]),
                    np.array([1, 2]), np.array([1.0, 2.0]))
    st.close(60 * US)
    st.add_partials("t", ["a"], np.array([0]), np.array([60 * US]),
                    np.array([4]), np.array([4.0]))
    st2 = WindowState.restore(st.snapshot(), update_horizon_us=100 * US)
    assert st2.pop_updates(60 * US) == st.pop_updates(60 * US)
    assert st2.closed == st.closed


def test_config_rejects_horizon_beyond_dedup_window():
    with pytest.raises(ValueError):
        EngineConfig(update_mode=True, update_horizon_s=600,
                     dedup_window_s=300).validate()


# ---------------- engine vs oracle (e2e) ----------------

@pytest.fixture(scope="module")
def update_run(tmp_path_factory):
    # dedicated fixture with a heavier very-late tail so the horizon
    # splits rows into BOTH accepted-corrections and still-late
    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec, generate_host_metadata, generate_pages)

    d = str(tmp_path_factory.mktemp("pages_late"))
    spec = PagesSpec(num_rows=2_000, very_late_frac=0.05, seed=11)
    generate_pages(d, spec)
    generate_host_metadata(d, spec)
    out = str(tmp_path_factory.mktemp("update_out"))
    summary = run_flagship(d, out, config=CFG_UPD)
    return d, out, summary


def _norm(df: pd.DataFrame, sort_cols) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def _assert_resume_byte_identical(d, ref_out, meta):
    import hashlib
    import os
    import tempfile

    from bitquery_kafka_streams_rust_ray.pipelines.streaming import (
        StreamingPagesPipeline)
    from bitquery_kafka_streams_rust_ray.reliability import RetryExhausted

    def hashes(out_dir):
        h = {}
        for root, _dirs, files in os.walk(out_dir):
            if "_tmp" in root or "_observability" in root:
                continue
            for f in files:
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    h[os.path.relpath(p, out_dir)] = hashlib.sha256(
                        fh.read()).hexdigest()
        return h

    out = tempfile.mkdtemp(prefix="upd_resume_")

    class Boom(RuntimeError):
        pass

    real = StreamingPagesPipeline._exchange_epoch

    def crashing(self, epoch, files, actors, watermark, attempt=0):
        if epoch == 2:
            raise Boom()
        return real(self, epoch, files, actors, watermark, attempt)

    def make_pipe():
        return StreamingPagesPipeline(
            d, out, CFG_UPD, PageFilter(min_text_len=1), meta)

    StreamingPagesPipeline._exchange_epoch = crashing
    try:
        with pytest.raises(RetryExhausted):
            make_pipe().run(resume=True)
    finally:
        StreamingPagesPipeline._exchange_epoch = real
    make_pipe().run(resume=True)

    ref_h, got_h = hashes(ref_out), hashes(out)
    assert set(got_h) == set(ref_h)
    diff = {k for k in ref_h if ref_h[k] != got_h[k]}
    assert not diff, f"differing files after resume: {sorted(diff)[:10]}"


def test_update_mode_matches_oracle(update_run):
    import pyarrow.parquet as pq
    import os

    d, out, summary = update_run
    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    oracle = run_oracle(d, CFG_UPD, PageFilter(min_text_len=1), meta)

    c = {k: int(v) for k, v in summary["metrics"]["counters"].items()
         if k not in ("windows_emitted", "windows_updated",
                      "sessions_updated")}
    assert c == oracle["counters"], f"{c} != {oracle['counters']}"
    # the fixture's very-late tail must exercise BOTH classifications
    assert c["late_accepted"] > 0, "horizon accepted no corrections"
    assert c["late_dropped"] > 0, "no rows beyond the horizon"

    sink = EpochSink(out)
    got = read_output_compacted(sink, "window_updates").to_pandas()
    rows = oracle["window_updates"]
    want = pd.DataFrame({
        "kind": [r[1] for r in rows],
        "key": [r[2] for r in rows],
        "window_start": pd.to_datetime([r[3] for r in rows], unit="us"),
        "window_end": pd.to_datetime([r[4] for r in rows], unit="us"),
        "doc_count": [r[5] for r in rows],
        "total_chars": [float(r[6]) for r in rows],
        "revision": [r[7] for r in rows],
    })
    assert len(got) > 0, "update mode produced no corrections"
    sort = ["kind", "key", "window_start", "revision"]
    pd.testing.assert_frame_equal(
        _norm(got, sort), _norm(want, sort), check_dtype=False,
        obj="window_updates")

    # base window emissions still match the oracle under update mode
    for name, kind in (("tumbling_lang", "tumbling:lang"),
                       ("sliding_lang", "sliding:lang")):
        g = _norm(read_output_compacted(sink, name).to_pandas(),
                  ["key", "window_start"])
        wrows = [r for r in oracle["windows"] if r[1] == kind]
        w = _norm(pd.DataFrame({
            "key": [r[2] for r in wrows],
            "window_start": pd.to_datetime([r[3] for r in wrows], unit="us"),
            "window_end": pd.to_datetime([r[4] for r in wrows], unit="us"),
            "doc_count": [r[5] for r in wrows],
            "total_chars": [float(r[6]) for r in wrows],
        }), ["key", "window_start"])
        pd.testing.assert_frame_equal(g, w, check_dtype=False, obj=name)

    # resume carries the retained-window store: crash after epoch 1,
    # resume in a fresh pipeline, and every committed byte (including
    # window_updates revisions) must match the uninterrupted run
    _assert_resume_byte_identical(d, out, meta)

    # consumer helper: read_windows_corrected == oracle base patched by
    # the oracle's highest-revision corrections
    from bitquery_kafka_streams_rust_ray.pipelines.flagship import read_windows_corrected

    corrected = read_windows_corrected(out)
    truth = {}
    for r in oracle["windows"]:
        if r[1] == "tumbling:lang":
            truth[(r[2], r[3])] = (r[5], float(r[6]))
    best_rev = {}
    for r in oracle["window_updates"]:
        if r[1] == "tumbling:lang":
            k = (r[2], r[3])
            if r[7] >= best_rev.get(k, 0):
                best_rev[k] = r[7]
                truth[k] = (r[5], float(r[6]))
    got_map = {
        (row.key, int(pd.Timestamp(row.window_start).value // 1000)):
            (int(row.doc_count), float(row.total_chars))
        for row in corrected.itertuples()
    }
    assert got_map == truth

    # corrected view: max-revision per (kind, key, start) supersedes the
    # base row, and every correction strictly grows the doc count
    base = read_output_compacted(sink, "tumbling_lang").to_pandas()
    tum = got[got["kind"] == "tumbling:lang"]
    if len(tum):
        last = tum.sort_values("revision").groupby(
            ["key", "window_start"], as_index=False).last()
        merged = last.merge(base, on=["key", "window_start"],
                            suffixes=("_upd", "_base"))
        assert len(merged) == len(last)  # every correction has a base row
        assert (merged["doc_count_upd"] > merged["doc_count_base"]).all()


# ---------------- session retract/add changelog ----------------

def _sess(gap_s=10, horizon_s=100):
    from bitquery_kafka_streams_rust_ray.state.store import SessionState
    return SessionState(gap_s * US, horizon_s * US)


def _add(st, key, ts_list):
    st.add([key] * len(ts_list),
           np.array([t * US for t in ts_list], dtype=np.int64),
           np.array([1.0] * len(ts_list)))


def test_session_reopen_extends_emitted_session():
    st = _sess()
    _add(st, "h", [0, 5])
    closed = st.close(100 * US)
    assert closed == [("h", 0, 15 * US, 2, 2.0)]
    assert st.pop_updates() == []

    # accepted-late row within gap of the retained emission reopens it
    _add(st, "h", [12])
    assert st.close(100 * US) == []  # routed to the changelog, not base
    upd = st.pop_updates()
    assert upd == [
        ("h", 0, 15 * US, 2, 2.0, "retract", 0),
        ("h", 0, 22 * US, 3, 3.0, "add", 1),
    ]
    # a second late row retracts the revision-1 add, not the original
    _add(st, "h", [20])
    st.close(100 * US)
    upd = st.pop_updates()
    assert upd == [
        ("h", 0, 22 * US, 3, 3.0, "retract", 1),
        ("h", 0, 30 * US, 4, 4.0, "add", 2),
    ]


def test_session_late_bridge_merges_two_emissions():
    st = _sess()
    _add(st, "h", [0])       # session A [0, 10)
    _add(st, "h", [18])      # session B [18, 28)
    closed = st.close(100 * US)
    assert [(r[1], r[2]) for r in closed] == [(0, 10 * US),
                                              (18 * US, 28 * US)]
    # one late event at t=9 is within gap of BOTH -> merge into one
    _add(st, "h", [9])
    st.close(100 * US)
    upd = st.pop_updates()
    assert upd == [
        ("h", 0, 10 * US, 1, 1.0, "retract", 0),
        ("h", 0, 28 * US, 3, 3.0, "add", 1),
        ("h", 18 * US, 28 * US, 1, 1.0, "retract", 0),
    ]


def test_session_untouched_retained_and_fresh_fragment():
    st = _sess(gap_s=10, horizon_s=100)
    _add(st, "h", [0])
    st.close(100 * US)
    # a late row NOT within gap of the retained emission is a genuinely
    # separate session: plain base emission, no changelog
    _add(st, "h", [50])
    closed = st.close(100 * US)
    assert closed == [("h", 50 * US, 60 * US, 1, 1.0)]
    assert st.pop_updates() == []
    # both emissions now retained; horizon aging drops them, after which
    # a row adjacent to the aged-out session starts FRESH (no retract)
    st.close(300 * US)
    assert st.closed == {}
    _add(st, "h", [55])
    assert st.close(400 * US) == [("h", 55 * US, 65 * US, 1, 1.0)]
    assert st.pop_updates() == []


def test_session_update_snapshot_roundtrip():
    from bitquery_kafka_streams_rust_ray.state.store import SessionState

    st = _sess()
    _add(st, "h", [0, 25])
    st.close(100 * US)
    _add(st, "h", [14])  # reopened (pending retracts on the open session)
    _add(st, "x", [90])  # plain open session
    st2 = SessionState.restore(st.snapshot())
    assert st2.close(200 * US) == st.close(200 * US)
    assert st2.pop_updates() == st.pop_updates()
    assert st2.closed == st.closed


def test_update_mode_session_changelog_matches_oracle(update_run):
    import os

    import pyarrow.parquet as pq

    d, out, summary = update_run
    meta = pq.read_table(os.path.join(d, "host_metadata.parquet")).to_pandas()
    oracle = run_oracle(d, CFG_UPD, PageFilter(min_text_len=1), meta)

    sink = EpochSink(out)
    got = read_output_compacted(sink, "session_updates").to_pandas()
    rows = oracle["session_updates"]
    assert len(rows) > 0, "fixture produced no session corrections"
    want = pd.DataFrame({
        "host": [r[1] for r in rows],
        "session_start": pd.to_datetime([r[2] for r in rows], unit="us"),
        "session_end": pd.to_datetime([r[3] for r in rows], unit="us"),
        "doc_count": [r[4] for r in rows],
        "total_chars": [float(r[5]) for r in rows],
        "action": [r[6] for r in rows],
        "revision": [r[7] for r in rows],
    })
    sort = ["host", "session_start", "session_end", "action", "revision"]
    pd.testing.assert_frame_equal(
        _norm(got, sort), _norm(want, sort), check_dtype=False,
        obj="session_updates")

    # base emissions still match the oracle under update mode
    g = _norm(read_output_compacted(sink, "session_host").to_pandas(),
              ["host", "session_start"])
    w = _norm(pd.DataFrame({
        "host": [r[1] for r in oracle["sessions"]],
        "session_start": pd.to_datetime(
            [r[2] for r in oracle["sessions"]], unit="us"),
        "session_end": pd.to_datetime(
            [r[3] for r in oracle["sessions"]], unit="us"),
        "doc_count": [r[4] for r in oracle["sessions"]],
        "total_chars": [float(r[5]) for r in oracle["sessions"]],
    }), ["host", "session_start"])
    pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                  obj="session_host")

    # consumer view: base patched by the changelog == oracle base patched
    # by the oracle's changelog (every retract matched a live row, every
    # surviving add is in the view exactly once)
    from bitquery_kafka_streams_rust_ray.pipelines.flagship import (
        read_sessions_corrected)

    corrected = read_sessions_corrected(out)
    truth = {(r[1], r[2], r[3]): (r[4], float(r[5]))
             for r in oracle["sessions"]}
    for r in oracle["session_updates"]:  # epoch order: retracts always
        k = (r[1], r[2], r[3])           # reference a live earlier row
        if r[6] == "retract":
            assert k in truth, f"retract of a row never emitted: {k}"
            del truth[k]
        else:
            truth[k] = (r[4], float(r[5]))
    got_map = {
        (row.host, int(pd.Timestamp(row.session_start).value // 1000),
         int(pd.Timestamp(row.session_end).value // 1000)):
            (int(row.doc_count), float(row.total_chars))
        for row in corrected.itertuples()
    }
    assert got_map == truth
