"""Events-table -> pages-log adapter: SQL-oracled streaming runs.

Re-shapes the TPC-H-ish ``events`` testdata table into the pages-log
wire format (``pages-{slice:04d}-{shard:02d}.parquet``, schema
``sources/pages.py::PAGES_SCHEMA``) so the FULL streaming engine —
epoch driver, watermarks, dedup, exactly-once sink, update-mode
corrections, early firing, interval join — can be driven over a table
whose final drained state is expressible in ANSI SQL over the very
same ``events`` view the external oracle pre-registers.  This is what
turns the streaming showcases from rows-only into hash-checked
entries: the stream is the events table, so "final windows after the
drain" has an exact DuckDB twin.

Mapping (all deterministic in (sf_dir, parameters)):

- ``url``      = ``https://u{user_id:06d}.example.com/e/{event_id}``
  (unique per row -> the url dedup stage passes everything through;
  the host part keys sessions / the interval join by *user*)
- ``warc_ts``  = ``ts``
- ``lang``     = ``event_type`` (keys the tumbling/sliding windows)
- ``text``     = ``"e" * (64 + event_id % 32)`` -> ``text_len`` is
  SQL-expressible as ``64 + event_id % 32``
- ``html``     = ``text_to_html(text)`` cycled raw / gzip / LZ4 by
  ``event_id % 3`` (exercises all three decompress sniffers)

Arrival order is by ``ts`` plus an optional deterministic late tail:
rows with ``event_id % late_mod == 3`` arrive ``late_delay_s`` behind
their event time, which lands them behind the frozen watermark and
exercises the allowed-lateness / update-mode machinery while keeping
the ACCEPTED row set equal to the whole table (the caller sizes the
update horizon past the delay), so the SQL twin stays exact.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.compression import compress_gzip, compress_lz4
from ..functions.extract import text_to_html
from .pages import PAGES_SCHEMA, url_shard


def event_url(user_id: int, event_id: int) -> str:
    return f"https://u{user_id:06d}.example.com/e/{event_id}"


# The SQL twin of the url/host/text_len mapping, for oracle builders.
SQL_HOST = "'u' || lpad(CAST(user_id AS VARCHAR), 6, '0') || '.example.com'"
SQL_URL = ("'https://u' || lpad(CAST(user_id AS VARCHAR), 6, '0') || "
           "'.example.com/e/' || CAST(event_id AS VARCHAR)")
SQL_TEXT_LEN = "(64 + event_id % 32)"


def events_pages_log(
    sf_dir: str,
    tag: str,
    *,
    num_slices: int = 16,
    shards: int = 4,
    late_mod: int = 0,
    late_delay_s: int = 0,
    poison_mod: int = 0,
    idle_shard: int | None = None,
    idle_frac: float = 0.25,
) -> str:
    """Write (once, cached) the events table as a pages log; return dir.

    ``poison_mod``: rows with ``event_id % poison_mod == 5`` carry an
    unparseable payload (raw garbage bytes) — the engine quarantines
    them (PARSE_ERROR -> DLQ) and the poisoned set is SQL-expressible,
    so the committed quarantine table has an exact oracle.

    ``idle_shard``: after the first ``idle_frac`` of arrival order,
    this key-shard stream receives no more files (its rows re-route to
    other shards — a PHYSICAL re-layout only, the row set is
    unchanged) — the dead-partition scenario for per-partition
    watermark idle exclusion, with the batch SQL twin still exact.
    """
    tier = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"/tmp/bitquery_kafka_streams_rust_ray_evlog_{tier}_{tag}"
    extra = () if poison_mod == 0 and idle_shard is None else (
        poison_mod, idle_shard, idle_frac, "v2")
    spec = repr((sf_dir, num_slices, shards, late_mod, late_delay_s,
                 "v1") + extra)
    marker = os.path.join(out_dir, ".complete")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == spec:
                return out_dir
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    df = pd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    eid = df["event_id"].to_numpy(dtype=np.int64)
    ts_us = df["ts"].astype("datetime64[us]").to_numpy().astype(np.int64)
    delay = np.zeros(len(df), dtype=np.int64)
    if late_mod > 0 and late_delay_s > 0:
        delay[eid % late_mod == 3] = late_delay_s * 1_000_000
    order = np.lexsort((eid, ts_us + delay))  # arrival order

    urls = np.array(
        [event_url(u, e) for u, e in zip(df["user_id"].to_numpy(), eid)],
        dtype=object,
    )
    texts = np.array(["e" * (64 + int(e) % 32) for e in eid], dtype=object)
    htmls = np.empty(len(df), dtype=object)
    for i, (t, e) in enumerate(zip(texts, eid)):
        if poison_mod > 0 and int(e) % poison_mod == 5:
            # unparseable payload: no HTML structure survives any
            # decompress sniff -> empty extract -> PARSE_ERROR -> DLQ
            htmls[i] = b"\x00\xfePOISON" + str(int(e)).encode()
            continue
        raw = text_to_html(t)
        mode = int(e) % 3
        htmls[i] = (raw if mode == 0
                    else compress_gzip(raw) if mode == 1
                    else compress_lz4(raw))

    arr = pd.DataFrame(
        {
            "url": urls[order],
            "warc_ts": df["ts"].to_numpy()[order],
            "html": htmls[order],
            "text": texts[order],
            "lang": df["event_type"].to_numpy()[order],
        }
    )
    shard_ids = np.array([url_shard(u, shards) for u in arr["url"]],
                         dtype=np.int64)
    if idle_shard is not None:
        # kill the stream after idle_frac of arrivals: later rows that
        # hash to it re-route to the next shard (layout change only)
        cut = int(len(arr) * idle_frac)
        tail = np.arange(len(arr)) >= cut
        hit = tail & (shard_ids == idle_shard)
        shard_ids[hit] = (idle_shard + 1) % shards
    bounds = np.linspace(0, len(arr), num_slices + 1).astype(np.int64)
    for s in range(num_slices):
        sl = arr.iloc[bounds[s]:bounds[s + 1]]
        sh = shard_ids[bounds[s]:bounds[s + 1]]
        for shard in range(shards):
            sub = sl[sh == shard]
            if idle_shard is not None and not len(sub):
                # a dead partition is ABSENT from later epoch plans
                # (no file), not an empty file — that's what ages its
                # idleness counter
                continue
            t = pa.Table.from_pandas(sub, preserve_index=False)
            t = pa.table(
                {
                    "url": t["url"].cast(pa.string()),
                    "warc_ts": t["warc_ts"].cast(pa.timestamp("us")),
                    "html": t["html"].cast(pa.large_binary()),
                    "text": t["text"].cast(pa.string()),
                    "lang": t["lang"].cast(pa.string()),
                },
                schema=PAGES_SCHEMA,
            )
            pq.write_table(
                t, os.path.join(out_dir,
                                f"pages-{s:04d}-{shard:02d}.parquet"))
    with open(marker, "w") as f:
        f.write(spec + "\n")
    return out_dir
