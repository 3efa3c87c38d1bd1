"""CEP extensions: timed-out partial matches (Flink
TimedOutPartialMatchHandler analog) and negation (notFollowedBy veto).

Unit geometry on ``FunnelState`` plus flagship engine-vs-oracle with
both extensions on; the default path (no veto, no timeout emission)
stays byte-identical and is covered by the existing e2e suites.
"""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from bitquery_kafka_streams_rust_ray.config import EngineConfig, FunnelConfig
from bitquery_kafka_streams_rust_ray.functions.filters import PageFilter
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship
from bitquery_kafka_streams_rust_ray.pipelines.oracle import run_oracle
from bitquery_kafka_streams_rust_ray.sinks.compaction import (
    read_output_compacted)
from bitquery_kafka_streams_rust_ray.sinks.exactly_once import EpochSink
from bitquery_kafka_streams_rust_ray.state.store import FunnelState
from bitquery_kafka_streams_rust_ray.stages.timeops import US

pytestmark = pytest.mark.usefixtures("ray_session")


def _fs(n=3, within_s=100, veto=None, timeouts=True):
    return FunnelState(n, within_s * US, veto_stage=veto,
                       emit_timeouts=timeouts)


def _add(st, key, pairs):
    """pairs: list of (ts_seconds, stage)."""
    st.add([key] * len(pairs),
           np.array([p[1] for p in pairs], dtype=np.int64),
           np.array([p[0] * US for p in pairs], dtype=np.int64))


# ---------------- timeout geometry ----------------

def test_timeout_emits_partial_progress():
    st = _fs()
    _add(st, "h", [(0, 0), (10, 1)])  # reached stage 2 of 3
    assert st.close(50 * US) == []
    assert st.pop_timeouts() == []  # bound not yet passed
    assert st.close(101 * US) == []
    assert st.pop_timeouts() == [("h", 0, 100 * US, 2)]
    # tombstoned: later stage-2 events cannot revive the key
    _add(st, "h", [(150, 2)])
    st.close(300 * US)
    assert st.pop_timeouts() == []


def test_completed_within_bound_never_times_out():
    st = _fs()
    _add(st, "h", [(0, 0), (10, 1), (20, 2)])
    assert st.close(200 * US) == [("h", 0, 20 * US)]
    assert st.pop_timeouts() == []


def test_completed_beyond_bound_counts_only_in_bound_progress():
    st = _fs()
    # chain completes at 150 but within=100: stages at 0 and 40 are in
    # bound, the completing stage at 150 is not
    _add(st, "h", [(0, 0), (40, 1), (150, 2)])
    assert st.close(200 * US) == []
    assert st.pop_timeouts() == [("h", 0, 100 * US, 2)]


def test_timeout_rows_deterministic_across_epoch_layouts():
    a, b = _fs(), _fs()
    events = [(0, 0), (30, 1), (70, 1), (120, 2)]
    _add(a, "h", events)
    a.close(200 * US)
    for e in events:  # one event per "epoch", interleaved closes
        _add(b, "h", [e])
        b.close((e[0] + 1) * US)
    b.close(200 * US)
    assert a.pop_timeouts() == b.pop_timeouts()


# ---------------- veto (notFollowedBy) geometry ----------------

def test_veto_kills_incomplete_chain():
    st = _fs(veto=3)
    _add(st, "h", [(0, 0), (10, 1), (20, 3), (30, 2)])
    assert st.close(200 * US) == []
    assert st.vetoes == 1
    # vetoed chains are silent even with emit_timeouts on
    assert st.pop_timeouts() == []


def test_veto_before_start_and_after_completion_is_ignored():
    st = _fs(veto=3)
    # veto before any stage-0: chain starts afterwards and completes
    _add(st, "x", [(0, 3), (10, 0), (20, 1), (30, 2)])
    # veto after the chain completed: match stands
    _add(st, "y", [(0, 0), (10, 1), (20, 2), (30, 3)])
    assert st.close(200 * US) == [("x", 10 * US, 30 * US),
                                  ("y", 0, 20 * US)]
    assert st.vetoes == 0


def test_veto_at_start_ts_is_strictly_after():
    st = _fs(veto=3)
    _add(st, "h", [(0, 0), (0, 3), (10, 1), (20, 2)])  # tie at start
    assert st.close(200 * US) == [("h", 0, 20 * US)]
    assert st.vetoes == 0


def test_funnel_snapshot_roundtrip_with_extensions():
    st = _fs(veto=3)
    _add(st, "h", [(0, 0), (10, 1)])
    _add(st, "k", [(0, 0), (5, 3)])
    st.close(101 * US)  # h times out (pending row), k vetoed
    st2 = FunnelState.restore(st.snapshot())
    assert st2.veto_stage == st.veto_stage
    assert st2.emit_timeouts == st.emit_timeouts
    assert st2.vetoes == st.vetoes == 1
    assert st2.pop_timeouts() == st.pop_timeouts()


def test_config_rejects_veto_below_last_bound():
    with pytest.raises(ValueError):
        EngineConfig(
            funnel=FunnelConfig(bounds=(250, 450), veto_min_len=400)
        ).validate()


# ---------------- engine vs oracle (e2e) ----------------

CFG_CEP = EngineConfig(
    min_text_len=1, state_shards=4, extract_concurrency=2,
    files_per_epoch=2,
    funnel=FunnelConfig(veto_min_len=470, emit_timeouts=True))


def test_cep_extensions_match_oracle(tmp_path):
    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec, generate_host_metadata, generate_pages)

    d = str(tmp_path / "pages")
    spec = PagesSpec(num_rows=2_000, seed=42)
    generate_pages(d, spec)
    generate_host_metadata(d, spec)
    out = str(tmp_path / "out")
    summary = run_flagship(d, out, config=CFG_CEP)
    meta = pq.read_table(
        os.path.join(d, "host_metadata.parquet")).to_pandas()
    oracle = run_oracle(d, CFG_CEP, PageFilter(min_text_len=1), meta)

    c = {k: int(v) for k, v in summary["metrics"]["counters"].items()
         if k != "windows_emitted"}
    assert c == oracle["counters"], f"{c} != {oracle['counters']}"
    # the fixture exercises all three outcomes
    assert c["funnels_matched"] > 0
    assert c["funnels_timed_out"] > 0
    assert c["funnels_vetoed"] > 0

    sink = EpochSink(out)
    got = (read_output_compacted(sink, "funnel_timeouts").to_pandas()
           .sort_values(["host", "start_ts"]).reset_index(drop=True))
    rows = oracle["funnel_timeouts"]
    want = pd.DataFrame({
        "host": [r[1] for r in rows],
        "start_ts": pd.to_datetime([r[2] for r in rows], unit="us"),
        "timeout_ts": pd.to_datetime([r[3] for r in rows], unit="us"),
        "reached_stage": [r[4] for r in rows],
    }).sort_values(["host", "start_ts"]).reset_index(drop=True)
    for df in (got, want):
        for col in ("start_ts", "timeout_ts"):
            df[col] = df[col].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  obj="funnel_timeouts")

    # matched funnels still equal the oracle's under the veto config
    gf = (read_output_compacted(sink, "funnel_host").to_pandas()
          .sort_values(["host", "start_ts"]).reset_index(drop=True))
    frows = oracle["funnels"]
    wf = pd.DataFrame({
        "host": [r[1] for r in frows],
        "start_ts": pd.to_datetime([r[2] for r in frows], unit="us"),
        "end_ts": pd.to_datetime([r[3] for r in frows], unit="us"),
    }).sort_values(["host", "start_ts"]).reset_index(drop=True)
    for df in (gf, wf):
        for col in ("start_ts", "end_ts"):
            df[col] = df[col].astype("datetime64[us]")
    pd.testing.assert_frame_equal(gf, wf, check_dtype=False,
                                  obj="funnel_host")
