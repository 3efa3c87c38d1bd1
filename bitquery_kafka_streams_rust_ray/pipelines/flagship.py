"""Flagship end-to-end pipeline: the full streaming DAG on a pages log.

This is the engine's "service binary" analog (reference
``src/main.rs:241-355``): generate-or-read a pages log, stream it
through extract -> filter -> dedup -> enrich -> windows with
exactly-once sink output, and return the committed results.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow.parquet as pq

from ..config import EngineConfig
from ..functions.filters import PageFilter
from ..sinks.exactly_once import EpochSink
from ..sources.pages import (
    PagesSpec,
    generate_host_metadata,
    generate_pages,
    pages_files,
)
from .streaming import StreamingPagesPipeline


def ensure_pages_log(data_dir: str, spec: PagesSpec) -> str:
    """Generate the deterministic pages log once; reuse if present.

    The marker records the FULL spec, so changing any field (span,
    skew, disorder bound, ...) regenerates rather than silently
    reusing a log produced under different parameters.
    """
    marker = os.path.join(data_dir, ".complete")
    want = repr(spec)
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == want:
                return data_dir
        shutil.rmtree(data_dir, ignore_errors=True)
    generate_pages(data_dir, spec)
    generate_host_metadata(data_dir, spec)
    with open(marker, "w") as f:
        f.write(want + "\n")
    return data_dir


def run_flagship(
    data_dir: str,
    output_dir: str,
    config: EngineConfig | None = None,
    resume: bool = True,
    drain: bool = True,
) -> dict:
    """Run the full streaming pipeline; returns the run summary."""
    config = config or EngineConfig(min_text_len=1)
    page_filter = (
        PageFilter(min_text_len=config.min_text_len)
        if config.min_text_len > 0
        else None
    )
    meta_path = os.path.join(data_dir, "host_metadata.parquet")
    meta = pq.read_table(meta_path).to_pandas() if os.path.exists(meta_path) else None
    pipe = StreamingPagesPipeline(
        input_dir=data_dir,
        output_dir=output_dir,
        config=config,
        page_filter=page_filter,
        host_metadata=meta,
    )
    summary = pipe.run(resume=resume, drain=drain)
    summary["sink"] = output_dir
    return summary


def flagship_outputs(output_dir: str) -> dict:
    """Read back all committed outputs of a flagship run (compaction-
    aware: identical to the per-epoch read when no compaction ran)."""
    from ..sinks.compaction import read_output_compacted

    sink = EpochSink(output_dir)
    return {
        name: read_output_compacted(sink, name)
        for name in ("pages", "tumbling_lang", "sliding_lang",
                     "session_host", "funnel_host", "topk_host",
                     "quarantine")
    }


def read_windows_corrected(output_dir: str, name: str = "tumbling_lang",
                           kind: str = "tumbling:lang"):
    """Consumer-side corrected view of a window output under update
    mode: the base (on-time, revision-0) emission per (key, start)
    superseded by its highest-revision correction from the
    ``window_updates`` output. Identical to the base table when the run
    had no corrections (or update mode was off). Returns a pandas
    DataFrame sorted by (key, window_start)."""
    from ..sinks.compaction import read_output_compacted

    sink = EpochSink(output_dir)
    base = read_output_compacted(sink, name).to_pandas()
    try:
        upd = read_output_compacted(sink, "window_updates").to_pandas()
    except Exception:
        upd = None
    if upd is not None and len(upd):
        upd = upd[upd["kind"] == kind]
    if upd is None or not len(upd):
        return (base.sort_values(["key", "window_start"])
                .reset_index(drop=True))
    last = (upd.sort_values("revision")
            .groupby(["key", "window_start"], as_index=False).last()
            .drop(columns=["kind", "revision"]))
    keep_cols = list(base.columns)
    merged = base.merge(last, on=["key", "window_start"], how="left",
                        suffixes=("", "_upd"))
    for c in ("doc_count", "total_chars", "window_end"):
        u = f"{c}_upd"
        if u in merged.columns:
            merged[c] = merged[u].where(merged[u].notna(), merged[c])
    out = merged[keep_cols].copy()
    out["doc_count"] = out["doc_count"].astype("int64")
    return out.sort_values(["key", "window_start"]).reset_index(drop=True)


def read_sessions_corrected(output_dir: str):
    """Consumer-side corrected view of the ``session_host`` output under
    update mode: apply the ``session_updates`` retract/add changelog to
    the base emissions — drop every retracted (host, start, end) row,
    append every added row that was not itself retracted by a later
    correction. A changelog (not in-place revision) because accepted-late
    rows can MERGE two emitted sessions into one with a new identity.
    Identical to the base table when the run had no corrections. Returns
    a pandas DataFrame sorted by (host, session_start)."""
    from ..sinks.compaction import read_output_compacted

    sink = EpochSink(output_dir)
    base = read_output_compacted(sink, "session_host").to_pandas()
    try:
        upd = read_output_compacted(sink, "session_updates").to_pandas()
    except Exception:
        upd = None
    if upd is None or not len(upd):
        return (base.sort_values(["host", "session_start"])
                .reset_index(drop=True))
    key_cols = ["host", "session_start", "session_end"]
    retracted = set(map(tuple, upd.loc[upd["action"] == "retract",
                                       key_cols].itertuples(index=False)))
    adds = upd[upd["action"] == "add"]
    live_adds = adds[~adds[key_cols].apply(tuple, axis=1).isin(retracted)]
    keep = ~base[key_cols].apply(tuple, axis=1).isin(retracted)
    out = pd.concat(
        [base[keep], live_adds[list(base.columns)]], ignore_index=True)
    out["doc_count"] = out["doc_count"].astype("int64")
    return (out.sort_values(["host", "session_start"])
            .reset_index(drop=True))
