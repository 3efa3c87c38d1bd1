"""Event-time window aggregation as Dataset operators (A2/T7 analogs).

Generalizes the reference's processing-time per-minute stats
(``examples/dex_monitor.rs:31-51``) to event-time tumbling, sliding and
session windows over ``warc_ts``, computed the scale-friendly way:

1. **partial** — inside ``map_batches`` each Arrow batch is
   pre-aggregated per (keys, window) with ``pyarrow`` group_by, so hot
   keys collapse to one row per batch *before* any shuffle;
2. **final** — a small ``groupby().aggregate()`` merges the partials.

An optional ``salt_shards`` demonstrates the explicit two-level
hot-key-salting reduce the north rule names: partials are first merged
per ``(key, window, salt)`` and then re-reduced per ``(key, window)``.
With per-batch partials the salt is usually redundant for algebraic
aggregates (the batch combine already bounds per-key fan-in to one row
per batch), so it defaults off.

Sliding windows with ``size = k * slide`` assign each row to its ``k``
covering windows by replicating partials, not raw rows.

Session windows need every event of a key in one place, so they hash-
shuffle on a stable key shard and run a vectorized gaps-and-islands
sweep per shard.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from .hashing import add_shard_column
from .timeops import US, column_ts_us, series_ts_us, us_to_timestamp_array

_SHARD = "_session_shard"


def assign_tumbling(
    batch: pa.Table,
    ts_col: str,
    size_s: float,
    out_col: str = "window_start",
    origin_us: int = 0,
) -> pa.Table:
    """Append the tumbling window start (timestamp[us]) of each row."""
    size_us = int(size_s * US)
    ts = column_ts_us(batch[ts_col])
    start = ((ts - origin_us) // size_us) * size_us + origin_us
    return batch.append_column(out_col, us_to_timestamp_array(start))


def _partial(
    batch: pa.Table,
    key_cols: list[str],
    ts_col: str,
    size_us: int,
    slide_us: int,
    value_col: str | None,
) -> pa.Table:
    """Per-batch partial aggregation: one row per (keys, window_start).

    For sliding windows (``size_us > slide_us``) the batch's per-slide
    partials are replicated across the ``size/slide`` covering windows —
    replication happens *after* the in-batch combine, so the shuffle
    carries ``k`` small partial rows per (key, slide), never raw rows.
    """
    ts = column_ts_us(batch[ts_col])
    slide_start = (ts // slide_us) * slide_us
    work = batch.select(key_cols + ([value_col] if value_col else []))
    work = work.append_column("_slide_start", pa.array(slide_start))
    aggs = [([], "count_all")]
    if value_col:
        aggs.append((value_col, "sum"))
    part = work.group_by(key_cols + ["_slide_start"]).aggregate(aggs)
    # pyarrow emits grouped keys first, then aggregates in request order
    names = {"count_all": "partial_count", f"{value_col}_sum": "partial_total"}
    part = part.rename_columns([names.get(c, c) for c in part.column_names])

    k = size_us // slide_us
    starts = part["_slide_start"].to_numpy(zero_copy_only=False)
    tables = []
    for i in range(k):
        w = part.drop_columns(["_slide_start"]).append_column(
            "window_start", us_to_timestamp_array(starts - i * slide_us)
        )
        tables.append(w)
    out = pa.concat_tables(tables)
    if not value_col:
        out = out.append_column(
            "partial_total", pa.array(np.zeros(out.num_rows), type=pa.float64())
        )
    return out


def windowed_agg(
    ds: ray.data.Dataset,
    key_cols: Sequence[str],
    ts_col: str,
    size_s: float,
    slide_s: float | None = None,
    value_col: str | None = None,
    salt_shards: int = 0,
    count_name: str = "doc_count",
    total_name: str = "total_value",
) -> ray.data.Dataset:
    """Tumbling (``slide_s`` None) or sliding window count+sum per key.

    Output columns: ``key_cols..., window_start, window_end,
    {count_name}, {total_name}`` (total omitted when ``value_col`` is
    None). Deterministic content; row order is up to the caller's sort.
    """
    key_cols = list(key_cols)
    size_us = int(size_s * US)
    slide_us = int((slide_s if slide_s is not None else size_s) * US)
    if size_us % slide_us != 0:
        raise ValueError("window size must be a multiple of slide")

    partials = ds.map_batches(
        lambda t: _partial(t, key_cols, ts_col, size_us, slide_us, value_col),
        batch_format="pyarrow",
    )

    if salt_shards > 1:
        # two-level reduce: (keys, window, salt) -> (keys, window)
        def add_salt(t: pa.Table) -> pa.Table:
            salt = np.arange(t.num_rows, dtype=np.int64) % salt_shards
            return t.append_column("_salt", pa.array(salt))

        level1 = (
            partials.map_batches(add_salt, batch_format="pyarrow")
            .groupby(key_cols + ["window_start", "_salt"])
            .aggregate(
                Sum("partial_count", alias_name="partial_count"),
                Sum("partial_total", alias_name="partial_total"),
            )
        )
        partials = level1.drop_columns(["_salt"])

    out = partials.groupby(key_cols + ["window_start"]).aggregate(
        Sum("partial_count", alias_name=count_name),
        Sum("partial_total", alias_name=total_name),
    )

    def finish(t: pa.Table) -> pa.Table:
        start = column_ts_us(t["window_start"])
        t = t.append_column("window_end", us_to_timestamp_array(start + size_us))
        if value_col is None:
            t = t.drop_columns([total_name])
        cast_count = t.column(count_name).cast(pa.int64())
        return t.set_column(t.column_names.index(count_name), count_name, cast_count)

    return out.map_batches(finish, batch_format="pyarrow")


def session_window_agg(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    gap_s: float,
    value_col: str | None = None,
    shards: int = 64,
    count_name: str = "doc_count",
    total_name: str = "total_value",
) -> ray.data.Dataset:
    """Session windows per key: maximal runs with inter-event gap <= gap.

    Convention (shared with the streaming ``SessionState``): a session
    spans ``[min_ts, max_ts + gap)``; a new event starts a new session
    iff its distance to the previous event of the key is strictly
    greater than ``gap``. Requires all rows of a key in one task, hence
    the stable hash shard shuffle.
    """
    gap_us = int(gap_s * US)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col], kind="mergesort")
        ts = series_ts_us(g[ts_col]).to_numpy()
        new_key = ~g[key_col].eq(g[key_col].shift()).to_numpy()
        gap_break = np.empty(len(g), dtype=bool)
        gap_break[0:1] = True
        if len(g) > 1:
            gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new_key | gap_break)
        val = (
            g[value_col].to_numpy(dtype=np.float64)
            if value_col
            else np.ones(len(g), dtype=np.float64)
        )
        df = pd.DataFrame(
            {key_col: g[key_col].to_numpy(), "_sid": sid, "_ts": ts, "_val": val}
        )
        agg = df.groupby([key_col, "_sid"], sort=True).agg(
            _start=("_ts", "min"), _last=("_ts", "max"),
            _count=("_ts", "size"), _total=("_val", "sum"),
        ).reset_index()
        out = pd.DataFrame(
            {
                key_col: agg[key_col],
                "session_start": pd.to_datetime(agg["_start"], unit="us"),
                "session_end": pd.to_datetime(agg["_last"] + gap_us, unit="us"),
                count_name: agg["_count"].astype("int64"),
            }
        )
        if value_col:
            out[total_name] = agg["_total"]
        return out

    return (
        ds.map_batches(
            lambda t: add_shard_column(t, key_col, shards, _SHARD),
            batch_format="pyarrow",
        )
        .groupby(_SHARD)
        .map_groups(per_shard, batch_format="pandas")
    )


def first_per_key(
    ds: ray.data.Dataset,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    shards: int = 64,
) -> ray.data.Dataset:
    """First-match-per-group selection (M5-M7 analog: "first successful
    transaction of a block", ``src/consumer.rs:267-304``)."""
    from .dedup import exact_dedup

    return exact_dedup(ds, key_cols, order_cols, shards=shards)


def global_minmax_ts(ds: ray.data.Dataset, ts_col: str) -> tuple[int, int]:
    """Min/max event time (us) of a dataset — tiny driver-side result."""
    row = ds.aggregate(Min(ts_col), Max(ts_col))
    lo, hi = row[f"min({ts_col})"], row[f"max({ts_col})"]
    to_us = lambda v: int(pd.Timestamp(v).value // 1000) if not isinstance(v, (int, np.integer)) else int(v)
    return to_us(lo), to_us(hi)
