"""Query catalog over the driver's testdata tables.

One callable per implemented operator family from SURVEY.md §2, each
expressed Ray-Data-first (vectorized map_batches, partial pre-agg before
shuffles, broadcast small sides) and paired — where ANSI-SQL can express
it — with a DuckDB oracle string in ``__ray_entry__.oracle_sql``.

Column names here MUST match the SQL aliases exactly; float aggregates
are rounded to 2 decimals on both sides so association-order float noise
cannot flip the value hash.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.text import TextAnalyzer
from ..stages.ann import ann_brute_force
from ..stages.broadcast import broadcast_get
from ..stages.dedup import exact_dedup, windowed_dedup
from ..stages.hashing import add_shard_column, shard_of
from ..stages.join import (broadcast_asof_join, broadcast_join, hash_join,
                           join_buckets, semi_join)
from ..stages.neardup import (component_labels, embedding_dedup,
                              minhash_dedup, simhash_dedup)
from ..stages.timeops import US, column_ts_us, series_ts_us, us_to_timestamp_array
from ..stages.windows import session_window_agg, windowed_agg

HOUR_US = 3600 * US
DAY_US = 86_400 * US


def _t(sf_dir: str, name: str, columns: list[str] | None = None,
       flt=None) -> rd.Dataset:
    """Pruned read: ``columns`` cuts at the column level, ``flt`` (a
    ``pyarrow.dataset`` expression, e.g. ``pc.field("v") >= 1``) pushes
    the predicate into the parquet scan — row groups whose statistics
    exclude it never leave storage. Only pure column comparisons go
    here; derived-column predicates stay in ``map_batches``."""
    kwargs = {"columns": columns}
    if flt is not None:
        kwargs["filter"] = flt
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           **kwargs)


def _tbytes(sf_dir: str, *names: str) -> int:
    """On-disk bytes of the named tables — sizes hash-join buckets."""
    return sum(os.path.getsize(os.path.join(sf_dir, f"{n}.parquet"))
               for n in names)


def _ppm(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """Exact half-away-from-zero integer parts-per-million of num/den
    (den > 0): ratios of exact integers land on .5 decimal boundaries
    where numpy's half-even and DuckDB's half-away round
    deterministically disagree, so ratio outputs ship as ppm ints
    computed in arbitrary precision. Signs split out first — Python
    ``//`` floors while DuckDB's truncates, which differ on negatives —
    and the oracle mirrors the magnitude with
    ``(2 * CAST(|num| AS HUGEINT) * 1000000 + den) // (2 * den)``.
    Domain: |num/den| must stay below ~9·10^12 so the ppm itself fits
    int64 — every caller is a share/rate (≤ 1) or a bounded average."""
    n = np.asarray(num).astype(object)
    d = np.asarray(den).astype(object)
    sign = np.where(n < 0, -1, 1).astype(object)
    return (sign * ((2 * n * sign * 1_000_000 + d) // (2 * d))).astype(
        np.int64)


def _pairs_in_shards(ds_sharded: rd.Dataset, basket_cols: list[str],
                     item_col: str, with_sizes: bool = False,
                     with_basket_count: bool = False):
    """Co-basket pair mining kernel shared by the co-occurrence /
    audience-Jaccard / co-purchase / vocabulary-overlap family.

    ``ds_sharded`` carries block-deduped (basket…, item, _shard) rows
    where every basket lives in exactly one shard; each shard
    self-merges its baskets in C (fan-out bounded by basket size),
    orders pairs a < b and pre-counts, so the global reduce is
    pairs-domain-sized. With ``with_sizes`` the per-item distinct-basket
    counts ride the same pass as sentinel rows (item_b = "") for
    Jaccard denominators; ``with_basket_count`` adds the shard's
    distinct-basket total the same way (baskets live in exactly one
    shard, so the sentinel counts sum exactly)."""
    a, b = f"{item_col}_a", f"{item_col}_b"

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(basket_cols + [item_col])
        m = d.merge(d, on=basket_cols, suffixes=("_a", "_b"))
        m = m[m[a] < m[b]]
        pairs = (m.groupby([a, b], sort=False).size()
                 .reset_index(name="n"))
        frames = [pairs]
        if with_sizes:
            sizes = (d.groupby(item_col, sort=False).size()
                     .reset_index(name="n"))
            sizes[a] = sizes.pop(item_col)
            sizes[b] = ""
            frames.append(sizes[[a, b, "n"]])
        if with_basket_count:
            frames.append(pd.DataFrame(
                {a: [""], b: [""],
                 "n": [len(d.drop_duplicates(basket_cols))]}))
        return pd.concat(frames, ignore_index=True) if len(frames) > 1 \
            else pairs

    raw = (ds_sharded.groupby("_shard")
           .map_groups(per_shard, batch_format="pandas")
           .to_pandas()
           .groupby([a, b], sort=True)["n"].sum().reset_index())
    n_baskets = None
    if with_basket_count:
        n_baskets = int(raw.loc[raw[a] == "", "n"].sum())
        raw = raw[raw[a] != ""]
    sizes = None
    if with_sizes:
        sizes = raw[raw[b] == ""].set_index(a)["n"].to_dict()
        raw = raw[raw[b] != ""]
    raw = raw.reset_index(drop=True)
    if with_basket_count:
        return raw, sizes, n_baskets
    return raw, sizes


def _round2(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """Round money-like float aggregates to whole cents.

    Sums of exact-cent inputs are within ~1e-9 cents of an integer cent
    count, so nearest-cent rounding is engine-agnostic (the numpy
    half-even vs DuckDB half-away tie rule only matters at half-cent
    boundaries, which such sums never approach). Never use floor here:
    floor(x*100) flips 50/50 on exact-cent sums depending on the sign of
    the association-order float error.
    """
    for c in cols:
        df[c] = np.round(df[c].to_numpy(dtype=np.float64) * 100.0) / 100.0
    return df


# --- A5/A1: grouped aggregation with per-batch partial combine ----------


def q1_pricing(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-style pricing summary (two-level aggregation)."""
    cutoff = pa.scalar(pd.Timestamp("1997-06-01"), type=pa.timestamp("us"))
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount", "l_shipdate"],
            flt=(pc.field("l_shipdate") <= pd.Timestamp("1997-06-01")))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("disc_price", disc)
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ([], "count_all")]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity_sum", alias_name="sum_qty"),
            Sum("l_extendedprice_sum", alias_name="sum_base"),
            Sum("disc_price_sum", alias_name="sum_disc"),
            Sum("count_all", alias_name="count_order"),
        )
        .to_pandas()
    )
    out["avg_qty"] = np.floor((out["sum_qty"] / out["count_order"]) * 100.0) / 100.0
    out["count_order"] = out["count_order"].astype("int64")
    return _round2(out, ["sum_qty", "sum_base", "sum_disc"])


# --- F1/F2: conjunctive vectorized filter -------------------------------


def filter_events(sf_dir: str) -> pd.DataFrame:
    """EventFilter analog: type set AND ts range AND value >= min."""
    lo = pa.scalar(pd.Timestamp("2024-01-08"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("2024-01-22"), type=pa.timestamp("us"))

    def mask(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"], pa.array(["click", "purchase"]))
        m = pc.and_(m, pc.greater_equal(t["ts"], lo))
        m = pc.and_(m, pc.less_equal(t["ts"], hi))
        m = pc.and_(m, pc.greater_equal(t["value"], 100.0))
        return t.filter(pc.fill_null(m, False))

    # the whole predicate also pushes into the parquet scan (row-group
    # statistics pruning); the batch mask re-applies it exactly, so the
    # pushdown is a pure I/O win with no correctness dependence
    flt = (pc.field("event_type").isin(["click", "purchase"])
           & (pc.field("ts") >= pd.Timestamp("2024-01-08"))
           & (pc.field("ts") <= pd.Timestamp("2024-01-22"))
           & (pc.field("value") >= 100.0))
    return (
        _t(sf_dir, "events",
           ["event_id", "user_id", "event_type", "ts", "value"], flt=flt)
        .map_batches(mask, batch_format="pyarrow")
        .to_pandas()
    )


# --- M10/F4: derived-column filter --------------------------------------


def revenue_items(sf_dir: str) -> pd.DataFrame:
    """Derived usd-value analog: revenue = price*(1-disc) >= threshold."""

    def derive(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("revenue", rev)
        return t.filter(pc.greater_equal(t["revenue"], 900.0)).select(
            ["l_orderkey", "l_linenumber", "revenue"]
        )

    return (
        _t(sf_dir, "lineitem",
           ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])
        .map_batches(derive, batch_format="pyarrow")
        .to_pandas()
    )


# --- M5-M7: first-match-per-group ---------------------------------------


def first_event_per_user(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts"])
    out = exact_dedup(ds, ["user_id"], ["ts", "event_id"], shards=16).to_pandas()
    return out[["user_id", "event_id", "ts"]]


# --- T1: exact content dedup --------------------------------------------


def dedup_documents_exact(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = exact_dedup(ds, ["text"], ["doc_id"], shards=16).to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


# --- T2: windowed dedup --------------------------------------------------


def windowed_dedup_events(sf_dir: str) -> pd.DataFrame:
    """MessageDeduplicator semantics on (user_id) with a 6h window."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "dedup_key", pc.cast(t["user_id"], pa.string())
        )

    ds = ds.map_batches(add_key, batch_format="pyarrow")
    out = windowed_dedup(ds, "dedup_key", "ts", window_s=6 * 3600,
                         shards=16, tiebreak_cols=["event_id"]).to_pandas()
    return out[["event_id"]].sort_values("event_id").reset_index(drop=True)


# --- A2/T7: event-time windows ------------------------------------------


def tumbling_events(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])
    out = windowed_agg(ds, ["event_type"], "ts", size_s=3600,
                       value_col="value", count_name="n_events",
                       total_name="total_value").to_pandas()
    out = out.drop(columns=["window_end"])
    # pin the driver-compare dtype: Ray's shuffle path can downcast a
    # whole-second timestamp[us] column to datetime64[s]
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return _round2(out, ["total_value"])


def sliding_events(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])
    out = windowed_agg(ds, ["event_type"], "ts", size_s=7200, slide_s=3600,
                       value_col="value", count_name="n_events",
                       total_name="total_value").to_pandas()
    out = out.drop(columns=["window_end"])
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return _round2(out, ["total_value"])


def window_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Windowed COUNT(DISTINCT): distinct users per (event_type, 1h
    tumbling window) — the window family's distinct dimension. Two-level
    exact shape: per-batch distinct (key, window, user) triples collapse
    duplicates before the shuffle; one sharded groupby finishes the
    distinct AND the count (per-shard pandas ``nunique`` over the
    deduped triples); the approximate
    sibling at unbounded user domains is ``hll_distinct``."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "user_id"])

    def triples(t: pa.Table) -> pa.Table:
        ws = pc.multiply(pc.divide(column_ts_us(t["ts"]), HOUR_US), HOUR_US)
        t = pa.table({"event_type": t["event_type"],
                      "window_start": ws,
                      "user_id": t["user_id"]})
        t = t.group_by(["event_type", "window_start",
                        "user_id"]).aggregate([])
        # co-partition key: windows spread across 16 shards, each shard
        # finishes its windows' distinct+count in ONE vectorized pass
        shard = pc.cast(pc.bit_wise_and(
            pc.divide(t["window_start"], pa.scalar(HOUR_US, pa.int64())),
            pa.scalar(15, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["event_type", "window_start"])["user_id"]
               .nunique().reset_index(name="n_users"))
        return agg

    out = (ds.map_batches(triples, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    out["window_start"] = us_to_timestamp_array(
        out["window_start"].to_numpy()).to_pandas()
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    out["n_users"] = out["n_users"].astype("int64")
    return (out.sort_values(["event_type", "window_start"])
            .reset_index(drop=True))


def session_events(sf_dir: str) -> pd.DataFrame:
    """Session windows per user (2h gap): start, last-event time, count."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def as_key(t: pa.Table) -> pa.Table:
        return t.append_column("skey", pc.cast(t["user_id"], pa.string()))

    out = session_window_agg(
        ds.map_batches(as_key, batch_format="pyarrow"),
        "skey", "ts", gap_s=2 * 3600, shards=16, count_name="n_events",
    ).to_pandas()
    out["user_id"] = out["skey"].astype("int64")
    gap = pd.Timedelta(hours=2)
    out["session_last"] = (out["session_end"] - gap).astype("datetime64[us]")
    out["session_start"] = out["session_start"].astype("datetime64[us]")
    return out[["user_id", "session_start", "session_last", "n_events"]]


# --- CEP pattern matching -------------------------------------------------


def funnel_events(sf_dir: str) -> pd.DataFrame:
    """CEP ordered-sequence match: users completing view -> click ->
    purchase (strictly increasing ts, greedy earliest chain) within 72h.
    """
    from ..stages.cep import funnel_match

    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    out = funnel_match(
        ds, "user_id", "ts", "event_type",
        pattern=["view", "click", "purchase"], within_s=72 * 3600,
        tiebreak_col="event_id", shards=16,
    ).to_pandas()
    out = out.sort_values("user_id").reset_index(drop=True)
    out["start_ts"] = out["start_ts"].astype("datetime64[us]")
    out["end_ts"] = out["end_ts"].astype("datetime64[us]")
    return out[["user_id", "start_ts", "end_ts"]]


def funnel_veto_events(sf_dir: str) -> pd.DataFrame:
    """CEP negation (Flink notFollowedBy): view -> click -> purchase
    within 72h with NO ``error`` event strictly inside (start, end) —
    the batch analog of the streaming funnel's ``veto_min_len`` kill
    (state/store.py::FunnelState veto fold)."""
    from ..stages.cep import funnel_match

    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    out = funnel_match(
        ds, "user_id", "ts", "event_type",
        pattern=["view", "click", "purchase"], within_s=72 * 3600,
        tiebreak_col="event_id", shards=16, veto_type="error",
    ).to_pandas()
    out = out.sort_values("user_id").reset_index(drop=True)
    out["start_ts"] = out["start_ts"].astype("datetime64[us]")
    out["end_ts"] = out["end_ts"].astype("datetime64[us]")
    return out[["user_id", "start_ts", "end_ts"]]


def funnel_timeout_events(sf_dir: str) -> pd.DataFrame:
    """CEP timed-out partial matches: users whose view -> click ->
    purchase funnel STARTED but did not complete within 72h, with the
    stage progress reached inside the bound — the batch analog of the
    streaming engine's ``funnel_timeouts`` output (abandoned-funnel
    analytics; Flink TimedOutPartialMatchHandler)."""
    from ..stages.cep import funnel_timeouts

    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    out = funnel_timeouts(
        ds, "user_id", "ts", "event_type",
        pattern=["view", "click", "purchase"], within_s=72 * 3600,
        tiebreak_col="event_id", shards=16,
    ).to_pandas()
    out = out.sort_values("user_id").reset_index(drop=True)
    out["start_ts"] = out["start_ts"].astype("datetime64[us]")
    out["timeout_ts"] = out["timeout_ts"].astype("datetime64[us]")
    out["reached_stage"] = out["reached_stage"].astype("int64")
    return out[["user_id", "start_ts", "timeout_ts", "reached_stage"]]


def abandoned_views(sf_dir: str) -> pd.DataFrame:
    """CEP absence/timeout match: view events with no click by the same
    user within the following 72h."""
    from ..stages.cep import absence_match

    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    out = absence_match(
        ds, "user_id", "ts", "event_type", trigger="view",
        followup="click", within_s=72 * 3600, id_cols=["event_id"],
        shards=16,
    ).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    out["ts"] = out["ts"].astype("datetime64[us]")
    return out[["event_id", "user_id", "ts"]]


# --- §2.5 joins ----------------------------------------------------------


def segment_orders(sf_dir: str) -> pd.DataFrame:
    """Broadcast join orders -> customer, grouped by market segment."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    cust = cust.rename(columns={"c_custkey": "o_custkey"})
    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = broadcast_join(ds, cust, on="o_custkey", how="inner",
                            concurrency=8)

    # ~5 segments: per-batch partials + driver merge beat a shuffle
    # (see priority_revenue)
    def partial(t: pa.Table) -> pa.Table:
        df = (t.select(["c_mktsegment", "o_totalprice"]).to_pandas()
              .groupby("c_mktsegment", sort=False)["o_totalprice"]
              .agg(["count", "sum"]).reset_index())
        return pa.Table.from_pandas(
            df.rename(columns={"count": "n_orders", "sum": "total"}),
            preserve_index=False,
        )

    partials = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (partials.groupby("c_mktsegment", sort=True)
           .agg(n_orders=("n_orders", "sum"), total=("total", "sum"))
           .reset_index())
    out["n_orders"] = out["n_orders"].astype("int64")
    return _round2(out, ["total"])


def priority_revenue(sf_dir: str) -> pd.DataFrame:
    """Partitioned hash join lineitem <-> orders (both 'large' sides)."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", r).select(["l_orderkey", "revenue"])

    li = li.map_batches(rev, batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    joined = hash_join(li, orders, on="l_orderkey",
                       buckets=join_buckets(_tbytes(sf_dir, "lineitem",
                                                    "orders")))

    # the final aggregate has ~5 groups: per-batch partials + an
    # output-sized driver merge beat a second shuffle (the groupby
    # would spin its own aggregator actors to reduce to 5 rows)
    def partial(t: pa.Table) -> pa.Table:
        df = (t.select(["o_orderpriority", "revenue"]).to_pandas()
              .groupby("o_orderpriority", sort=False)["revenue"]
              .agg(["count", "sum"]).reset_index())
        return pa.Table.from_pandas(
            df.rename(columns={"count": "n_items", "sum": "revenue"}),
            preserve_index=False,
        )

    partials = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (partials.groupby("o_orderpriority", sort=True)
           .agg(n_items=("n_items", "sum"), revenue=("revenue", "sum"))
           .reset_index())
    out["n_items"] = out["n_items"].astype("int64")
    return _round2(out, ["revenue"])


def q3_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3-shaped three-way join: segment-filtered customers
    (small side, broadcast semi join — the customer table never
    shuffles) -> date-filtered orders, hash-joined with
    shipdate-filtered lineitem on the order key -> grouped revenue ->
    top 10. Both date filters prune BEFORE the join, so only
    qualifying rows enter the shuffle. Revenue is summed in integer
    1e-4 units (cents x cents), making the ranking — and the SQL
    oracle's hash — bit-exact."""
    cutoff = pa.scalar(pd.Timestamp("1998-01-01"), type=pa.timestamp("us"))

    cust = (
        _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"],
           flt=(pc.field("c_mktsegment") == "BUILDING"))
        .map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"],
                                        pa.scalar("BUILDING"))),
            batch_format="pyarrow",
        )
        .to_pandas()  # filtered keys only — the broadcast side
    )
    keys = cust["c_custkey"].tolist()

    orders = semi_join(
        _t(sf_dir, "orders",
           ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
           flt=(pc.field("o_orderdate") < pd.Timestamp("1998-01-01"))),
        keys, "o_custkey",
    ).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], cutoff)).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).rename_columns(["l_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow",
    )

    def li_rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cutoff))
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0), t["l_discount"]), 100.0)), pa.int64())
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "rev_e4": pc.multiply(cents, disc),
        })

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
            flt=(pc.field("l_shipdate") > pd.Timestamp("1998-01-01"))
            ).map_batches(li_rev, batch_format="pyarrow")

    joined = hash_join(li, orders, on="l_orderkey",
                       buckets=join_buckets(_tbytes(sf_dir, "lineitem",
                                                    "orders")))
    grouped = (
        joined.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])
        .aggregate(Sum("rev_e4", alias_name="revenue_e4"))
        .to_pandas()  # one row per qualifying order — reduced frame
    )
    grouped["revenue_e4"] = grouped["revenue_e4"].astype("int64")
    grouped["o_orderdate"] = grouped["o_orderdate"].astype("datetime64[us]")
    out = grouped.sort_values(
        ["revenue_e4", "o_orderdate", "l_orderkey"],
        ascending=[False, True, True], kind="mergesort",
    ).head(10)
    return out[["l_orderkey", "revenue_e4", "o_orderdate",
                "o_orderpriority"]].reset_index(drop=True)


def asof_latest_order(sf_dir: str) -> pd.DataFrame:
    """As-of join: each event enriched with the customer's latest order
    total at event time (symbol-table metadata semantics)."""
    # collapse ties with per-batch partials (max is associative) so the
    # driver only ever receives the REDUCED frame — which is exactly the
    # frame it must broadcast anyway; the raw orders table never lands
    # driver-side, and no shuffle happens (a Dataset.groupby here costs
    # a full exchange to produce the same small result)
    def partial_max(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
              .groupby(["o_custkey", "o_orderdate"], sort=False)
              ["o_totalprice"].max().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = (
        _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(partial_max, batch_format="pyarrow")
        .to_pandas()
    )
    latest = (
        partials.groupby(["o_custkey", "o_orderdate"], sort=True)
        ["o_totalprice"].max().reset_index()
        .rename(columns={"o_custkey": "user_id",
                         "o_totalprice": "latest_total"})
    )
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    # concurrency=None -> plain tasks; the pre-sorted small side is
    # ray.put once and cached per worker process, so there is no actor
    # pool to spin up and the read stays fully pipelined
    out = broadcast_asof_join(
        ds, latest, on="user_id", ts_col="ts", version_ts_col="o_orderdate",
        defaults={"latest_total": 0.0}, concurrency=None,
    ).to_pandas()
    return out[["event_id", "latest_total"]]


def asof_latest_order_partitioned(sf_dir: str) -> pd.DataFrame:
    """Same result as ``asof_latest_order`` through the BOTH-SIDES-LARGE
    physical plan: the raw version history stays a Dataset, both sides
    hash-co-partition on the key, and merge_asof runs inside each shard
    — nothing is broadcast, nothing lands on the driver. The
    max-total-per-(key, date) collapse costs NO extra shuffle: the
    right side's in-shard sort tiebreaks on the total, and backward
    merge_asof takes the last (= max) same-ts row per key. The plan to
    reach for when the version history itself is shuffle-scale."""
    from ..stages.join import partitioned_asof_join

    latest = (
        _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(lambda t: t.rename_columns(
            ["user_id", "o_orderdate", "latest_total"]),
            batch_format="pyarrow")
    )
    events = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = partitioned_asof_join(
        events, latest, on="user_id", left_ts="ts", right_ts="o_orderdate",
        defaults={"latest_total": 0.0}, right_tiebreak=["latest_total"],
    ).to_pandas()
    out = out[["event_id", "latest_total"]]
    # the typed-null union upcasts event_id to float64; pin it back so
    # the driver's dtype-sensitive value hash matches the BIGINT oracle
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def orders_within_month(sf_dir: str) -> pd.DataFrame:
    """Range (interval) join, self-join flavor: every (a, b) order pair
    of the same customer where b's date falls inside [a.date,
    a.date + 30 days] — one hash co-partition + per-group sorted
    interval sweep (``stages/join.py::interval_join``), never a cross
    product. The repeat-purchase-burst query shape."""
    from ..stages.join import interval_join

    base = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    probe = base.map_batches(
        lambda df: df.rename(columns={"o_orderkey": "key_b",
                                      "o_custkey": "user_id"}),
        batch_format="pandas")

    def with_end(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"o_orderkey": "key_a",
                                "o_custkey": "user_id"})
        df["o_end"] = df["o_orderdate"] + pd.Timedelta(days=30)
        return df.rename(columns={"o_orderdate": "o_start"})

    intervals = base.map_batches(with_end, batch_format="pandas")
    out = interval_join(probe, intervals, on="user_id",
                        left_ts="o_orderdate", right_start="o_start",
                        right_end="o_end").to_pandas()
    out = out[["key_a", "key_b"]]
    # the probe/interval union upcasts keys to float64; pin to int64 so
    # the dtype-sensitive value hash matches the BIGINT oracle
    out = out.astype({"key_a": "int64", "key_b": "int64"})
    return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)


def vip_events(sf_dir: str) -> pd.DataFrame:
    """Broadcast semi join: events of the top-10 customers by balance."""
    # prune right after the read — only the filtered candidate rows
    # reach the driver
    cust = (
        _t(sf_dir, "customer", ["c_custkey", "c_acctbal"],
           flt=(pc.field("c_custkey") < 100))
        .map_batches(
            lambda t: t.filter(pc.less(t["c_custkey"], pa.scalar(100))),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    top = cust.sort_values(["c_acctbal", "c_custkey"],
                           ascending=[False, True]).head(10)["c_custkey"]
    ds = _t(sf_dir, "events", ["event_id", "user_id", "value"])
    out = semi_join(ds, top.tolist(), "user_id").to_pandas()
    if out.empty:  # tiny scale factors may select zero matching events
        out = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                            "user_id": pd.Series(dtype="int64"),
                            "value": pd.Series(dtype="float64")})
    return out.sort_values("event_id").reset_index(drop=True)


# --- §2.7 sort / top-k / distinct ----------------------------------------


def topk_orders(sf_dir: str) -> pd.DataFrame:
    """Global top-20 without a global sort: each block keeps its own
    top-20 (O(n) per block), the driver merges blocks x 20 rows.  At
    100 TB this ships ~20 rows per block instead of range-shuffling the
    whole table."""
    k = 20

    def partial(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k, [("o_totalprice", "descending"), ("o_orderkey", "ascending")]
        )
        return t.take(idx)

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (
        parts.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def distinct_users(sf_dir: str) -> pd.DataFrame:
    """Exact distinct count per group (two-level groupby)."""
    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="_c")
    )
    out = (
        pairs.groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


# --- §2.8 scalar string functions ---------------------------------------


def string_funcs_part(sf_dir: str) -> pd.DataFrame:
    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "name_lower": pc.utf8_lower(t["p_name"]),
                "brand_upper": pc.utf8_upper(t["p_brand"]),
                "type_prefix": pc.utf8_slice_codeunits(t["p_type"], 0, 5),
                "hex_key": _hex_upper(t["p_partkey"]),
            }
        )

    return (
        _t(sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_type"])
        .map_batches(project, batch_format="pyarrow")
        .to_pandas()
    )


def _hex_upper(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized ``to_hex``: one hexlify of the big-endian int64
    buffer, reshaped to 16-char strings, leading zeros trimmed by the
    Arrow kernel (the per-row ``format(k, 'X')`` loop this replaces is
    interpreter work per value)."""
    k = (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
         else col).to_numpy().astype(">u8")
    hx = k.tobytes().hex().upper()
    fixed = pa.array(np.frombuffer(hx.encode("ascii"), dtype="S16").astype("U16"))
    trimmed = pc.utf8_ltrim(fixed, characters="0")
    return pc.if_else(pc.equal(trimmed, ""), pa.scalar("0"), trimmed)


def json_props_events(sf_dir: str) -> pd.DataFrame:
    """Typed JSON field getter (SolanaEvent.get_data_* analog).

    Fast path: Arrow's re2 ``extract_regex`` pulls the integer field
    vectorized; rows the regex misses (absent key, non-integer value)
    fall back to a real ``json.loads`` — so semantics stay JSON, but
    the hot path never enters the interpreter per row."""

    def extract(t: pa.Table) -> pa.Table:
        props = (t["props"].combine_chunks()
                 if isinstance(t["props"], pa.ChunkedArray) else t["props"])
        m = pc.extract_regex(props, r'"k"\s*:\s*(?P<v>-?\d+)')
        ks = pc.cast(pc.struct_field(m, "v"), pa.int64())
        misses = pc.and_(pc.is_null(ks), pc.is_valid(props))
        if pc.any(misses).as_py():
            idx = np.nonzero(misses.to_numpy(zero_copy_only=False))[0]
            vals = ks.to_pylist()
            raw = props.to_pylist()
            for i in idx:
                try:
                    v = json.loads(raw[i]).get("k")
                    vals[i] = int(v) if v is not None else None
                except (TypeError, ValueError):
                    vals[i] = None
            ks = pa.array(vals, type=pa.int64())
        return pa.table({"event_id": t["event_id"], "k_val": ks})

    return (
        _t(sf_dir, "events", ["event_id", "props"])
        .map_batches(extract, batch_format="pyarrow")
        .to_pandas()
    )


# --- A4 percentiles ------------------------------------------------------


def percentiles_events(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def pct(g: pd.DataFrame) -> pd.DataFrame:
        # discrete quantiles (actual data values): numpy inverted_cdf is
        # exactly DuckDB's quantile_disc, so the comparison stays exact —
        # continuous interpolation differs between engines in the last ulp
        v = g["value"].to_numpy(dtype=np.float64)
        p = lambda qq: np.percentile(v, qq, method="inverted_cdf")
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "p50": [p(50)], "p90": [p(90)], "p95": [p(95)], "p99": [p(99)],
            }
        )

    return (
        ds.groupby("event_type").map_groups(pct, batch_format="pandas")
        .to_pandas()
    )


# --- text analysis -------------------------------------------------------


def doc_stats(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "token_count": pc.cast(
                    pc.count_substring_regex(text, r"\S+"), pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow").to_pandas()


def text_analysis_documents(sf_dir: str) -> pd.DataFrame:
    """Lang-ID + quality + fingerprint (rows-only check: the heuristics
    are not SQL-expressible).

    Plain tasks, not an actor pool: the analyzer instance holds two
    scalars (see the minhash_candidates note) — a model-backed analyzer
    would pass the class + ``concurrency=`` instead."""
    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = ds.map_batches(
        TextAnalyzer(text_col="text"), batch_format="pyarrow",
    ).to_pandas()
    out["lang_match"] = (out["lang_id"] == out["lang"]).astype("int64")
    return out[["doc_id", "lang_id", "lang_match", "quality", "token_count",
                "bpe_count", "fingerprint"]]


# --- near-dup family (rows-only: iterative/stateful, not ANSI SQL) ------


def minhash_dedup_documents(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = minhash_dedup(ds, jaccard_threshold=0.8).to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def simhash_dedup_documents(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = simhash_dedup(ds, max_hamming=3).to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def embedding_dedup_vectors(sf_dir: str) -> pd.DataFrame:
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_dedup(ds, threshold=0.98).to_pandas()
    return out[["vec_id"]].sort_values("vec_id").reset_index(drop=True)


# --- similarity search ---------------------------------------------------


def ann_topk(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-10: first 5 vectors as the query matrix."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = (
        semi_join(ds, [0, 1, 2, 3, 4], "vec_id")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.asarray(qdf["embedding"].tolist(), dtype=np.float64)
    out = ann_brute_force(ds, queries, k=10)
    # map positional query index back to its vec_id
    qids = qdf["vec_id"].tolist()
    out["query_id"] = out["query_id"].map(lambda i: qids[i]).astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out[["query_id", "vec_id", "rank"]]


def ann_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF-approximate cosine top-10 (the scale path of ann_topk:
    k-means lists + nprobe probing; rows-only — approximate by
    construction)."""
    from ..stages.ann import ann_ivf

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = (
        semi_join(ds, [0, 1, 2, 3, 4], "vec_id")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.asarray(qdf["embedding"].tolist(), dtype=np.float64)
    # nprobe=12/16 lists: measured recall@10 = 0.96 vs brute force on
    # BOTH the sf0.01 and sf0.1 embeddings (pinned >=0.9 by
    # test_ivf_recall_on_sf001_embeddings / _on_sf01). The table is
    # near-isotropic gaussian — worst case for IVF — so the probed
    # fraction is the recall dial; see BASELINE.md for the
    # recall-vs-nprobe curve and the low-nprobe speed point.
    out = ann_ivf(ds, queries, k=10, nlist=16, nprobe=12)
    qids = qdf["vec_id"].tolist()
    out["query_id"] = out["query_id"].map(lambda i: qids[i]).astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out[["query_id", "vec_id", "rank"]]


def nearest_ref_vector(sf_dir: str) -> pd.DataFrame:
    """Broadcast similarity join (the transposed-broadcast ANN
    direction): every vector outside the reference set (vec_id >= 50)
    is assigned its nearest reference vector (vec_id < 50) by cosine.
    The reference matrix ships once via ``ray.put``; the corpus side is
    a pure streaming map — no shuffle, scales with corpus size only."""
    from ..stages.ann import similarity_join

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    refdf = (
        ds.map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], pa.scalar(50))),
            batch_format="pyarrow",
        )
        .to_pandas()  # reference side only — 50 rows by construction
        .sort_values("vec_id")
    )
    corpus = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["vec_id"], pa.scalar(50))),
        batch_format="pyarrow",
    )
    out = similarity_join(
        corpus,
        refdf["vec_id"].to_numpy(),
        np.asarray(refdf["embedding"].tolist(), dtype=np.float64),
    ).to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    out["ref_id"] = out["ref_id"].astype("int64")
    return (out[["vec_id", "ref_id"]]
            .sort_values("vec_id").reset_index(drop=True))


def label_centroids_embeddings(sf_dir: str) -> pd.DataFrame:
    """Per-label centroid reduction over the embedding column — the
    vector analog of grouped sum (class prototypes for nearest-centroid
    classification / dataset cartography). Each batch reduces to one
    k x dim integer partial (components scaled to 1e-6 units BEFORE
    summing, so the distributed sum is order-independent and bit-exact
    against the SQL oracle — same trick as the k-means fit,
    stages/cluster.py); the driver merges labels x dim integers, never
    raw vectors. At 100 TB this is a pure streaming map whose exchange
    volume is labels x dim x blocks ints."""
    ds = _t(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        labs = t["label"].to_numpy(zero_copy_only=False)
        embs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        e6 = np.floor(embs * 1e6 + 0.5).astype(np.int64)
        out_l, out_n, out_s = [], [], []
        for lab in np.unique(labs):
            m = labs == lab
            out_l.append(int(lab))
            out_n.append(int(m.sum()))
            out_s.append(e6[m].sum(axis=0).tolist())
        return pa.table({
            "label": pa.array(out_l, type=pa.int64()),
            "n": pa.array(out_n, type=pa.int64()),
            "sums": pa.array(out_s, type=pa.list_(pa.int64())),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    acc: dict[int, tuple[int, np.ndarray]] = {}
    for lab, n, s in zip(partials["label"], partials["n"], partials["sums"]):
        n0, s0 = acc.get(int(lab), (0, None))
        v = np.asarray(s, dtype=np.int64)
        acc[int(lab)] = (n0 + int(n), v if s0 is None else s0 + v)
    rows = [(lab, n, ",".join(str(int(x)) for x in s))
            for lab, (n, s) in sorted(acc.items())]
    return pd.DataFrame(rows, columns=["label", "n_vectors", "centroid_e6"])


def knn_classify_embeddings(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """k-NN label classification: every vector outside the labeled
    reference set (vec_id >= 50) gets the majority label of its k=5
    nearest reference vectors by cosine (ties by smaller label). The
    reference side broadcasts once; the corpus side is a pure
    streaming map — per batch one Q @ R^T matmul, a stable argsort for
    the (score desc, ref_id asc) neighbor order, and a one-hot vote
    matrix, no Python rows. At 10^12 corpus vectors the reference side
    would route through the IVF index (stages/ann.py) instead of a
    dense matmul; the vote composition is unchanged."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "label", "embedding"])
    refdf = (
        ds.map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], pa.scalar(50))),
            batch_format="pyarrow",
        )
        .to_pandas()  # 50 rows by construction
        .sort_values("vec_id")
    )
    ref_mat = np.asarray(refdf["embedding"].tolist(), dtype=np.float64)
    ref_mat /= np.linalg.norm(ref_mat, axis=1, keepdims=True)
    labels = np.unique(refdf["label"].to_numpy())
    lab_idx = refdf["label"].map(
        {lab: i for i, lab in enumerate(labels)}).to_numpy()
    ref = ray.put((ref_mat, lab_idx))

    def classify(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["vec_id"], pa.scalar(50)))
        if not t.num_rows:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "pred_label": pa.array([], pa.int64())})
        mat, lidx = broadcast_get(ref)  # once per worker process
        x = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        scores = x @ mat.T
        # stable sort on -score: ties fall back to column order, which
        # IS ref_id ascending (the reference frame is id-sorted)
        top = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        votes = np.zeros((len(x), len(labels)), dtype=np.int32)
        rows = np.repeat(np.arange(len(x)), k)
        np.add.at(votes, (rows, lidx[top.ravel()]), 1)
        pred = labels[votes.argmax(axis=1)]  # first max = smaller label
        return pa.table({
            "vec_id": t["vec_id"].cast(pa.int64()),
            "pred_label": pa.array(pred.astype(np.int64)),
        })

    out = ds.map_batches(classify, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def quantize_embeddings(sf_dir: str) -> pd.DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    storage/serving compression every large vector corpus ships (4x
    smaller, dequant error <= scale/2 per component). Per-vector
    absmax scale, components mapped to round-half-up ints in
    [-127, 127]; the scale is emitted in 1e-6 units so the whole
    output is integer and the distributed result hashes bit-exact
    against the SQL oracle. Pure streaming map — no shuffle, no
    driver materialization; zero-magnitude vectors are dropped like
    the oracle's maxabs > 0 gate."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "scale_e6": pa.array([], pa.int64()),
                      "q_int8": pa.array([], pa.string())})

    def quant(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        embs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        maxabs = np.abs(embs).max(axis=1)
        # non-finite vectors quarantine like zero vectors (the oracle's
        # isfinite gate): NaN would otherwise silently diverge between
        # numpy (NaN > 0 is False) and SQL (NaN sorts above everything)
        keep = (maxabs > 0) & np.isfinite(maxabs)
        embs, maxabs = embs[keep], maxabs[keep]
        q = np.floor(embs * 127.0 / maxabs[:, None] + 0.5).astype(np.int64)
        scale_e6 = np.floor(maxabs / 127.0 * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            "vec_id": t["vec_id"].filter(pa.array(keep)).cast(pa.int64()),
            "scale_e6": pa.array(scale_e6),
            "q_int8": pa.array([",".join(map(str, row)) for row in q],
                               type=pa.string()),
        })

    out = ds.map_batches(quant, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def user_set_ops(sf_dir: str) -> pd.DataFrame:
    """INTERSECT / EXCEPT over key sets (§2.7 set ops): event-emitting
    users split into those who are known customers (intersect) and
    those who are not (except). The events side reduces to its
    distinct-key set with ONE narrow groupby (user_id only — the
    events rows never move); the customer key set broadcasts
    (``ray.put`` once) into a vectorized membership map. At 10^12
    events the exchange is bounded by the distinct-user count, and the
    broadcast side is the smaller table by construction."""
    users = (_t(sf_dir, "events", ["user_id"])
             .groupby("user_id").count())
    cust = _t(sf_dir, "customer", ["c_custkey"]).to_pandas()
    cust_ref = ray.put(np.sort(cust["c_custkey"].to_numpy()))

    def tag(t: pa.Table) -> pa.Table:
        keys = np.sort(broadcast_get(cust_ref))
        u = t["user_id"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, u)
        idx[idx >= len(keys)] = 0 if len(keys) else 0
        known = (keys[idx] == u) if len(keys) else np.zeros(len(u), bool)
        return pa.table({
            "user_id": pa.array(u.astype(np.int64)),
            "op": pa.array(np.where(known, "both", "events_only")),
        })

    out = users.map_batches(tag, batch_format="pyarrow").to_pandas()
    return (out.sort_values(["user_id", "op"])
            .reset_index(drop=True))


def source_quality_filter(sf_dir: str) -> pd.DataFrame:
    """C4/Gopher-style host-level quality gate: keep only documents
    from sources whose MEAN document length clears a floor. Two-stage:
    a distributed ``groupby(source)`` reduces to one (sum, count) row
    per source; the (tiny) passing-source list broadcasts back as a
    semi-join mask — the corpus never shuffles. The threshold compare
    is integer arithmetic (sum >= floor * count), so the SQL oracle
    hash-matches exactly."""
    floor_chars = 290
    ds = _t(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    per_source = (
        ds.groupby("source")
        .aggregate(Sum("n_chars", alias_name="sum_chars"),
                   Count(alias_name="n_docs"))
        .to_pandas()  # one row per source — small by construction
    )
    kept = per_source[
        per_source["sum_chars"] >= floor_chars * per_source["n_docs"]
    ]["source"].tolist()
    out = semi_join(ds, kept, "source").to_pandas()
    if out.empty:  # no source passed: Ray drops the schema with the rows
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "source": pd.Series([], dtype=str),
                             "n_chars": pd.Series([], dtype="int64")})
    return (out[["doc_id", "source", "n_chars"]]
            .sort_values("doc_id").reset_index(drop=True))


def nested_doc_words(sf_dir: str) -> pd.DataFrame:
    """Arrow struct/list columns end-to-end (SURVEY §1.2 nested-payload
    breadth: ``repeated``/nested protobuf fields -> ``pa.list_`` /
    ``pa.struct``): text splits to a ``list<string>`` column, a
    ``struct<n_words, first_word>`` column is built beside it, both
    nested columns cross a sort shuffle intact, and the fields are
    extracted on the far side (``pc.struct_field`` / ``list_element``)."""

    def nest(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks() if isinstance(
            t["text"], pa.ChunkedArray) else t["text"]
        words = pc.split_pattern_regex(text, r"\s+")
        st = pa.StructArray.from_arrays(
            [pc.cast(pc.list_value_length(words), pa.int64()),
             pc.utf8_lower(pc.list_element(words, 0))],
            names=["n_words", "first_word"],
        )
        return pa.table({"doc_id": t["doc_id"], "words": words, "props": st})

    def flatten(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_words": pc.struct_field(t["props"], "n_words"),
            "first_word": pc.struct_field(t["props"], "first_word"),
        })

    out = (
        _t(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(nest, batch_format="pyarrow")
        .sort("doc_id")  # nested columns ride the range shuffle
        .map_batches(flatten, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def ngram_jaccard_documents(sf_dir: str) -> pd.DataFrame:
    """Exact all-pairs char-trigram Jaccard >= 0.8 within lang blocks
    (the block column bounds the quadratic comparison). Emits the
    integer intersection/union beside the double so the SQL oracle is
    bit-exact (the ratio of the same two ints is the same double in
    any engine)."""
    from ..stages.neardup import ngram_jaccard_pairs

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = ngram_jaccard_pairs(ds, threshold=0.8, block_col="lang")
    for c in ("id_a", "id_b", "inter", "uni"):
        out[c] = out[c].astype("int64")
    out["jaccard"] = out["jaccard"].astype("float64")
    return out.reset_index(drop=True)


# --- §2.7 sampling / set ops / per-group top-k ---------------------------


_SAMPLE_MULT = 2654435761  # Knuth multiplicative hash constant
_SAMPLE_MOD = 1 << 32


def sample_events(sf_dir: str, pct: int = 5) -> pd.DataFrame:
    """Deterministic hash sample (§2.7 sampling): keep ``pct``% of rows by
    a multiplicative hash of the key — reproducible across engines and
    cluster layouts (unlike ``Dataset.random_sample``), pure arithmetic so
    DuckDB computes the identical subset. Embarrassingly parallel: one
    vectorized mask per batch, no shuffle."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    threshold = (_SAMPLE_MOD * pct) // 100

    def mask(t: pa.Table) -> pa.Table:
        h = pc.multiply(t["event_id"], pa.scalar(_SAMPLE_MULT, pa.int64()))
        m = pa.scalar(_SAMPLE_MOD, pa.int64())
        h = pc.subtract(h, pc.multiply(pc.divide(h, m), m))
        return t.filter(pc.less(h, pa.scalar(threshold, pa.int64())))

    return ds.map_batches(mask, batch_format="pyarrow").to_pandas()


def nation_presence(sf_dir: str) -> pd.DataFrame:
    """Set op via ``Dataset.union`` (§2.7): customers and suppliers tagged
    and unioned, then per-nation membership counts. Partial counts are
    combined per batch before the (tiny, one-key) groupby shuffle."""
    cust = _t(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]).append_column(
            "is_cust", pa.array([1] * len(t), pa.int64())),
        batch_format="pyarrow")
    supp = _t(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]).append_column(
            "is_cust", pa.array([0] * len(t), pa.int64())),
        batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("nationkey").aggregate([("is_cust", "sum"),
                                               ([], "count_all")])
        return pa.table({
            "nationkey": g["nationkey"],
            "n_cust": g["is_cust_sum"],
            "n_supp": pc.subtract(g["count_all"], g["is_cust_sum"]),
        })

    out = (
        cust.union(supp)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(Sum("n_cust", alias_name="n_cust"),
                   Sum("n_supp", alias_name="n_supp"))
        .to_pandas()
    )
    out["n_cust"] = out["n_cust"].astype("int64")
    out["n_supp"] = out["n_supp"].astype("int64")
    return out


def top3_orders_per_segment(sf_dir: str) -> pd.DataFrame:
    """Per-group top-k (§2.7): broadcast the customer→segment map onto
    orders, keep a per-batch partial top-3 per segment, then collapse the
    tiny reduced set (≤ 3·segments·blocks rows) on the driver — the same
    partial-top-k shape as ``ann_brute_force``, never a full sort."""
    seg = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg = seg.rename(columns={"c_custkey": "o_custkey"})
    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, seg, on="o_custkey", how="inner",
                            concurrency=2)

    def partial_top3(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_totalprice", "o_orderkey"],
                            ascending=[False, True])
        return df.groupby("c_mktsegment", sort=False).head(3)

    reduced = joined.map_batches(partial_top3,
                                 batch_format="pandas").to_pandas()
    out = (
        reduced.sort_values(["o_totalprice", "o_orderkey"],
                            ascending=[False, True])
        .groupby("c_mktsegment", sort=False).head(3)
        .sort_values(["c_mktsegment", "o_orderkey"])
        .reset_index(drop=True)
    )
    return out[["c_mktsegment", "o_orderkey", "o_totalprice"]]


def non_customer_events(sf_dir: str) -> pd.DataFrame:
    """Distributed anti-join (§2.5): events whose user has no even-keyed
    customer row (the testdata makes every user a customer, so the deny
    side is the even half), via Ray's native hash-shuffle left-outer
    join + null filter —
    both sides stream, no driver materialization (contrast ``vip_events``
    where the allow-list side is small enough to broadcast)."""
    events = _t(sf_dir, "events", ["event_id", "user_id"])

    def even_flagged(t: pa.Table) -> pa.Table:
        k = t["c_custkey"]
        two = pa.scalar(2, pa.int64())
        t = t.filter(pc.equal(
            pc.subtract(k, pc.multiply(pc.divide(k, two), two)),
            pa.scalar(0, pa.int64())))
        return pa.table({
            "user_id": t["c_custkey"],
            "c_flag": pa.array([1] * len(t), pa.int64()),
        })

    cust = _t(sf_dir, "customer", ["c_custkey"]).map_batches(
        even_flagged, batch_format="pyarrow")
    joined = hash_join(events, cust, on="user_id", how="left",
                       buckets=join_buckets(_tbytes(sf_dir, "events",
                                                    "customer")))
    out = (
        joined.map_batches(
            lambda t: t.filter(pc.is_null(t["c_flag"]))
                       .select(["event_id", "user_id"]),
            batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


# --- §2.8 date / math / array scalar functions ---------------------------


def monthly_orders(sf_dir: str) -> pd.DataFrame:
    """Date functions (§2.8 timestamp stringify, consumer.rs:289 analog):
    calendar-month truncation + strftime label, partial counts per batch
    before the groupby."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        month = pc.floor_temporal(t["o_orderdate"], unit="month")
        return (
            t.drop_columns(["o_orderdate"]).append_column("month", month)
            .group_by("month")
            .aggregate([("o_totalprice", "sum"), ([], "count_all")])
        )

    df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("o_totalprice_sum", alias_name="total"),
                   Sum("count_all", alias_name="n_orders"))
        .to_pandas()
    )
    df["n_orders"] = df["n_orders"].astype("int64")
    # date32 months surface as datetime64[s]; pin to us like every other
    # timestamp column (the value hash is dtype-sensitive)
    df["month"] = df["month"].astype("datetime64[us]")
    df = _round2(df, ["total"])
    label = pc.strftime(pa.Array.from_pandas(df["month"]), format="%Y-%m")
    df["month_label"] = label.to_pandas()
    return df[["month", "month_label", "n_orders", "total"]]


def math_funcs_lineitem(sf_dir: str) -> pd.DataFrame:
    """Math scalar functions (§2.8: abs/ceil/floor/sqrt/ln/round/modulo
    and the events.rs:109-125 numeric-parse analog of int→float cast) as
    one vectorized Arrow pass, no shuffle."""
    ds = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
             "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        # integer-space outputs: IEEE sqrt/divide are correctly rounded
        # (bit-identical across engines), and scaled floor/round land on
        # exact integers — so the cross-engine hash cannot pick up ULP
        # noise the way round-to-4-decimals floats would
        price = t["l_extendedprice"]
        key = t["l_orderkey"]
        m = pa.scalar(97, pa.int64())
        bp = pc.cast(pc.round(pc.multiply(
            pc.abs(pc.subtract(t["l_discount"], pa.scalar(0.05))),
            pa.scalar(10000.0))), pa.int64())
        return pa.table({
            "l_orderkey": key,
            "l_linenumber": t["l_linenumber"],
            "disc_dev_bp": bp,
            "qty_ceil": pc.ceil(t["l_quantity"]),
            "price_bucket": pc.floor(pc.divide(price, pa.scalar(100.0))),
            "price_sqrt_4": pc.cast(
                pc.floor(pc.multiply(pc.sqrt(price), pa.scalar(10000.0))),
                pa.int64()),
            "price_ln_3": pc.cast(
                pc.floor(pc.multiply(pc.ln(pc.add(price, pa.scalar(1.0))),
                                     pa.scalar(1000.0))), pa.int64()),
            "key_mod": pc.subtract(key, pc.multiply(pc.divide(key, m), m)),
            "line_f": pc.cast(t["l_linenumber"], pa.float64()),
        })

    return ds.map_batches(derive, batch_format="pyarrow").to_pandas()


def docs_by_lang(sf_dir: str) -> pd.DataFrame:
    """Array construction (§2.8 array functions / §1.2 repeated fields):
    per-language sorted doc-id lists built inside ``map_groups`` — the
    list column crosses the groupby shuffle as native Arrow
    ``list<int64>``."""
    ds = _t(sf_dir, "documents", ["doc_id", "lang"])

    def collect(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].tolist())
        # the list itself crosses the shuffle; the hash-compared output
        # column is its joined string form (stable across engines)
        return pd.DataFrame({
            "lang": [group["lang"].iloc[0]],
            "doc_ids": [",".join(str(i) for i in ids)],
            "n_docs": [len(ids)],
        })

    out = ds.groupby("lang").map_groups(collect,
                                        batch_format="pandas").to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


# --- §2.6 breadth: rollup / pivot / per-key running windows --------------


def rollup_orders(sf_dir: str) -> pd.DataFrame:
    """GROUPING SETS / ROLLUP: one distributed groupby at the finest
    grain, coarser levels derived from the REDUCED frame (sum of sums
    is exact) — never a second pass over the data. The driver only
    ever touches the ~priorities×years-row aggregate."""
    orders = _t(sf_dir, "orders", ["o_orderpriority", "o_orderdate",
                                   "o_totalprice"])

    def keyed(t: pa.Table) -> pa.Table:
        years = pc.strftime(
            pc.cast(t["o_orderdate"], pa.timestamp("us")), "%Y")
        return pa.table({
            "priority": t["o_orderpriority"],
            "year": years,
            "o_totalprice": t["o_totalprice"],
        })

    base = (orders.map_batches(keyed, batch_format="pyarrow")
            .groupby(["priority", "year"])
            .aggregate(Count(alias_name="n_orders"),
                       Sum("o_totalprice", alias_name="total"))
            .to_pandas())
    lvl1 = (base.groupby("priority", as_index=False)
            .agg(n_orders=("n_orders", "sum"), total=("total", "sum")))
    lvl1["year"] = "ALL"
    lvl0 = pd.DataFrame({
        "priority": ["ALL"], "year": ["ALL"],
        "n_orders": [base["n_orders"].sum()],
        "total": [base["total"].sum()],
    })
    out = pd.concat([base, lvl1, lvl0], ignore_index=True)
    out["n_orders"] = out["n_orders"].astype("int64")
    out = _round2(out, ["total"])
    return (out[["priority", "year", "n_orders", "total"]]
            .sort_values(["priority", "year"]).reset_index(drop=True))


def pivot_lineitem(sf_dir: str) -> pd.DataFrame:
    """Pivot (conditional aggregation): per-batch masked partials — one
    row per (flag, batch) with the F/O sums and counts — then a tiny
    groupby-sum. The status dimension never becomes a shuffle key."""
    li = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        f = df["l_linestatus"] == "F"
        price = df["l_extendedprice"]
        return (df.assign(
            total_f=price.where(f, 0.0),
            total_o=price.where(~f, 0.0),
            n_f=f.astype("int64"),
            n_o=(~f).astype("int64"))
            .groupby("l_returnflag", as_index=False, sort=False)
            [["total_f", "total_o", "n_f", "n_o"]].sum())

    out = (li.map_batches(partial, batch_format="pandas")
           .groupby("l_returnflag")
           .aggregate(Sum("total_f", alias_name="total_f"),
                      Sum("total_o", alias_name="total_o"),
                      Sum("n_f", alias_name="n_f"),
                      Sum("n_o", alias_name="n_o"))
           .to_pandas())
    out["n_f"] = out["n_f"].astype("int64")
    out["n_o"] = out["n_o"].astype("int64")
    out = _round2(out, ["total_f", "total_o"])
    return out.sort_values("l_returnflag").reset_index(drop=True)


def running_events(sf_dir: str) -> pd.DataFrame:
    """Per-key window functions (running sum + row_number): the group
    is the parallelism unit — ``groupby(user).map_groups`` sorts each
    user's events by (ts, event_id) and computes the cumulative values
    vectorized. Matches SUM() OVER (PARTITION BY user ORDER BY ts)
    ROWS UNBOUNDED PRECEDING."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def windowed(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "running_value": g["value"].cumsum().round(2),
            "rn": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    out = (ds.groupby("user_id").map_groups(windowed, batch_format="pandas")
           .to_pandas())
    return out.sort_values("event_id").reset_index(drop=True)


def sessionize_events(sf_dir: str, gap_s: int = 7200) -> pd.DataFrame:
    """Gap-based sessionization with per-EVENT session assignment (the
    labeling sibling of the session-window aggregates): each user's
    events sort by (ts, event_id) and a new session starts when the gap
    to the previous event exceeds ``gap_s``. One hash co-partition on
    the user key, vectorized cumsum inside each group — the standard
    clickstream sessionizer."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    gap_us = gap_s * US

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts_us = series_ts_us(g["ts"]).to_numpy()
        new = np.ones(len(g), dtype=np.int64)
        new[1:] = (np.diff(ts_us) > gap_us).astype(np.int64)
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "session_idx": np.cumsum(new),
        })

    out = (ds.groupby("user_id").map_groups(assign, batch_format="pandas")
           .to_pandas())
    return out.sort_values("event_id").reset_index(drop=True)


def zscore_events(sf_dir: str) -> pd.DataFrame:
    """Per-group normalization (z-score of value within event_type) —
    the standard two-pass featurizer: per-batch (count, sum, sumsq)
    partials reduce to a groups-sized frame on the driver, the stats
    broadcast back into a pure map. The corpus never shuffles; only
    3 numbers per (block, group) move. Population std, both sides
    rounded to 2 decimals."""
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        sq = pc.multiply(t["value"], t["value"])
        t = t.append_column("value_sq", sq)
        return t.group_by("event_type").aggregate(
            [("value", "sum"), ("value_sq", "sum"), ([], "count_all")])

    stats = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby("event_type").sum())
    mean = stats["value_sum"] / stats["count_all"]
    std = np.sqrt(stats["value_sq_sum"] / stats["count_all"] - mean ** 2)
    mean_d, std_d = mean.to_dict(), std.to_dict()

    def z(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pandas()
        m = et.map(mean_d).to_numpy()
        s = et.map(std_d).to_numpy()
        # zero-variance group: every value equals the mean, so the SQL
        # oracle's 0/0 is NaN — emit NaN explicitly instead of the
        # inf/NaN mix a raw division would produce
        safe = np.where(s == 0.0, 1.0, s)
        zv = np.round((t["value"].to_numpy() - m) / safe, 2)
        zv = np.where(s == 0.0, np.nan, zv)
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "z": pa.array(zv, pa.float64())})

    out = ds.map_batches(z, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def long_docs_p90(sf_dir: str) -> pd.DataFrame:
    """Exact distributed quantile filter: keep docs whose length is at
    or above the corpus p90. No sort anywhere — the cutoff comes from a
    bounded-domain value histogram (per-batch (n_chars, count) partials,
    one tiny groupby, integer cumulative rule ``10*count_le >= 9*n`` on
    the output-sized frame), then broadcasts into a pure filter map.
    Two streaming passes total; when the value domain is unbounded the
    sibling is ``stages/sketches.py::histogram_quantiles``."""
    docs = _t(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("n_chars").aggregate([([], "count_all")])

    hist = (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("n_chars").aggregate(Sum("count_all", alias_name="cnt"))
            .to_pandas().sort_values("n_chars"))
    n = int(hist["cnt"].sum())
    count_le = hist["cnt"].cumsum().to_numpy()
    cutoff = int(hist["n_chars"].to_numpy()[10 * count_le >= 9 * n][0])
    out = docs.filter(expr=f"n_chars >= {cutoff}").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def pagerank_trade_graph(sf_dir: str, iters: int = 3,
                         d: float = 0.5) -> pd.DataFrame:
    """PageRank over the customer<->supplier trade graph — the
    oracle-checked iterative algorithm (k-means is the rows-only
    sibling). Edges = distinct (customer, supplier) pairs from
    orders |><| lineitem, both directions, so every node has out-edges
    (no dangling mass). Per iteration: ranks/degrees broadcast
    (node-sized), one vectorized map over the distributed edge list
    emits per-batch (dst, contribution) partials, a tiny groupby
    reduces them, the driver folds the damping base. The edge list —
    the big side — never moves after its one materialization; at
    larger-than-memory node counts the ranks broadcast becomes a hash
    join (documented tradeoff). d=0.5 and 3 iterations keep the float
    tree shallow; both sides round to 6 decimals."""
    import ray

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = (_t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
          .map_batches(lambda t: t.rename_columns(["o_orderkey",
                                                   "l_suppkey"]),
                       batch_format="pyarrow"))
    joined = hash_join(li, orders, on="o_orderkey",
                       buckets=join_buckets(_tbytes(sf_dir, "lineitem",
                                                    "orders")))

    # distinct (cust, supp) pairs as ONE int64 composite key — a string
    # pair groupby over millions of rows is ~10x the cost of the same
    # distinct on a packed int (measured 45s -> ~5s at sf0.1); the
    # tuned exact_dedup shard path does the global distinct
    def pair_key(t: pa.Table) -> pa.Table:
        t = t.group_by(["o_custkey", "l_suppkey"]).aggregate([])
        key = pc.add(pc.multiply(t["o_custkey"],
                                 pa.scalar(1 << 32, pa.int64())),
                     t["l_suppkey"])
        return pa.table({"key": key})

    uniq = exact_dedup(joined.map_batches(pair_key, batch_format="pyarrow"),
                       key_cols=["key"], order_cols=["key"])

    # degrees fall out of two SMALL int groupbys on the distinct pairs
    # (both edge directions exist, so deg(c_i) = #pairs with cust i,
    # deg(s_j) = #pairs with supp j) — never a string groupby over the
    # full edge list
    def split_ids(t: pa.Table) -> pa.Table:
        cust = pc.divide(t["key"], pa.scalar(1 << 32, pa.int64()))
        supp = pc.subtract(t["key"], pc.multiply(
            cust, pa.scalar(1 << 32, pa.int64())))
        return pa.table({"cust": cust, "supp": supp})

    # materialized: two consumers (the degree reduce + the encode)
    # would otherwise each re-run join+distinct; this is the reduced
    # pair table (two int64s per edge), not the corpus
    pairs = uniq.map_batches(split_ids, batch_format="pyarrow").materialize()

    # BOTH degree vectors in ONE pass of node-sized per-block partials
    # merged on the driver — the degree frame is dimension-sized
    # (customers + suppliers), so two Ray all-to-all groupbys over the
    # edge list cost ~15 s at sf0.1 for what a blocks x nodes partial
    # merge does in ~0.3 s (the `zscore_events` two-pass shape)
    def deg_partial(t: pa.Table) -> pa.Table:
        tc = (t.group_by("cust").aggregate([([], "count_all")])
              .rename_columns(["node", "deg"]))
        ts = (t.group_by("supp").aggregate([([], "count_all")])
              .rename_columns(["node", "deg"]))
        return pa.concat_tables([
            tc.append_column("side", pa.array(["c"] * len(tc))),
            ts.append_column("side", pa.array(["s"] * len(ts)))])

    deg = (pairs.map_batches(deg_partial, batch_format="pyarrow")
           .to_pandas().groupby(["side", "node"], as_index=False)["deg"]
           .sum())
    deg_c = deg[deg["side"] == "c"].sort_values("node")
    deg_s = deg[deg["side"] == "s"].sort_values("node")
    custs = deg_c["node"].to_numpy()
    supps = deg_s["node"].to_numpy()
    n = len(custs) + len(supps)
    deg_arr = np.concatenate([deg_c["deg"].to_numpy(),
                              deg_s["deg"].to_numpy()]).astype(np.float64)
    idx_ref = ray.put((custs, supps))

    # edges re-encoded to int32 node indexes, materialized once (~8
    # bytes/edge); iterations stream over this list with no shuffle at
    # all — each batch's contributions collapse to ONE dense float
    # vector (node-sized), vectors fold on the driver
    def encode(t: pa.Table, _ref=idx_ref) -> pa.Table:
        cs, ss = ray.get(_ref)
        ci = np.searchsorted(cs, t["cust"].to_numpy()).astype(np.int32)
        si = (len(cs) + np.searchsorted(ss, t["supp"].to_numpy())
              ).astype(np.int32)
        return pa.table({"src": np.concatenate([ci, si]),
                         "dst": np.concatenate([si, ci])})

    edges = pairs.map_batches(encode, batch_format="pyarrow").materialize()

    ranks = np.full(n, 1.0 / n)
    for _ in range(iters):
        state_ref = ray.put(ranks / deg_arr)

        def contrib(t: pa.Table, _ref=state_ref, _n=n) -> pa.Table:
            w = ray.get(_ref)  # zero-copy numpy from the object store
            vec = np.bincount(t["dst"].to_numpy(),
                              weights=w[t["src"].to_numpy()], minlength=_n)
            return pa.table({"vec": pa.array([vec.tobytes()], pa.binary())})

        parts = edges.map_batches(contrib, batch_format="pyarrow").to_pandas()
        total = np.zeros(n)
        for blob in parts["vec"]:
            total += np.frombuffer(blob)
        ranks = (1 - d) / n + d * total

    names = ([f"c{i}" for i in custs] + [f"s{j}" for j in supps])
    out = pd.DataFrame({"node": names, "rank6": np.round(ranks, 6)})
    return out.sort_values("node").reset_index(drop=True)


def median_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact GROUPED median — the classically shuffle-hostile statistic
    — via per-(group, value) count partials: one tiny groupby reduces
    the corpus to its value histogram per group, the lower-median rule
    ``2*count_le >= n`` runs on that output-sized frame. No sort of the
    data anywhere; works whenever the per-group value domain is bounded
    (here ~1.8k distinct cents per type), with
    ``histogram_quantiles`` as the unbounded-domain sibling."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "value"]).aggregate(
            [([], "count_all")])

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "value"])
            .aggregate(Sum("count_all", alias_name="cnt"))
            .to_pandas().sort_values(["event_type", "value"]))
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        cle = g["cnt"].cumsum().to_numpy()
        n = int(cle[-1])
        rows.append((et, float(g["value"].to_numpy()[2 * cle >= n][0])))
    return pd.DataFrame(rows, columns=["event_type", "median_value"])


# --- mergeable sketches: the 100 TB path for distinct/quantiles ----------


def approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct users per event type (rows-only for the
    driver — approximate by construction; accuracy vs the exact
    operator is pinned by ``tests/test_sketches.py`` at <2% error).
    The exchange moves one 16 KiB sketch per (group, block) instead of
    every distinct user id."""
    from ..stages.sketches import hll_distinct

    return hll_distinct(
        _t(sf_dir, "events", ["event_type", "user_id"]),
        group_col="event_type", value_col="user_id")


def approx_percentiles_events(sf_dir: str) -> pd.DataFrame:
    """Mergeable fixed-width-histogram quantiles per event type
    (rows-only; error ≤ one bin width = range/4096, pinned by
    ``tests/test_sketches.py``). Companion scale path to the exact
    ``percentiles_events``."""
    from ..stages.sketches import histogram_quantiles

    return histogram_quantiles(
        _t(sf_dir, "events", ["event_type", "value"]),
        group_col="event_type", value_col="value")


def kmeans_embeddings_query(sf_dir: str) -> pd.DataFrame:
    """Full-data distributed Lloyd's k-means over the embeddings table
    (rows-only: iterative, not ANSI SQL; layout-invariance and
    convergence pinned by ``tests/test_cluster.py``)."""
    from ..stages.cluster import kmeans_embeddings

    return kmeans_embeddings(
        _t(sf_dir, "embeddings", ["vec_id", "embedding"]))


def approx_top_bigrams(sf_dir: str) -> pd.DataFrame:
    """Misra-Gries heavy hitters over token bigrams (rows-only:
    undercount-by-design; guarantees pinned by ``test_sketches.py``).
    The frequency-sketch path for ``top_bigrams_documents`` when the
    bigram vocabulary itself is shuffle-scale: per-batch summaries are
    ≤ k entries no matter how many distinct bigrams a block holds."""
    from ..stages.sketches import heavy_hitters

    def bigrams(text):
        toks = (text or "").split()
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    return heavy_hitters(_t(sf_dir, "documents", ["text"]),
                         "text", k=256, items_fn=bigrams).head(20)


# --- training-data text ops: scrubbing / n-gram counts / stratified ------

_SCRUB_PATTERN = r"\b(customer|spark|vector)\b"
_SCRUB_TOKEN = "<SCRUBBED>"


def redact_documents(sf_dir: str) -> pd.DataFrame:
    """PII-style pattern scrubbing: vectorized re2 ``replace_substring
    _regex`` over the corpus plus a per-doc hit count (the audit trail a
    redaction pass must emit). Pure map — no shuffle; both this and the
    DuckDB oracle run RE2, so the dialect matches exactly. On real data
    the pattern set is emails/phones/SSNs; the fixture corpus has no
    digits, so the test pattern scrubs known word tokens instead."""

    def scrub(t: pa.Table) -> pa.Table:
        text = t["text"]
        return pa.table({
            "doc_id": t["doc_id"],
            "scrubbed": pc.replace_substring_regex(
                text, _SCRUB_PATTERN, _SCRUB_TOKEN),
            "n_hits": pc.cast(
                pc.count_substring_regex(text, _SCRUB_PATTERN), pa.int64()),
        })

    out = (_t(sf_dir, "documents", ["doc_id", "text"])
           .map_batches(scrub, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def top_bigrams_documents(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Corpus-level n-gram statistics (the language-model-style count
    every data-quality pipeline wants): token bigram counts with the
    classic two-level shape — a per-batch ``Counter`` partial collapses
    each batch to its distinct bigrams BEFORE the shuffle, the
    ``groupby(bigram).sum`` only moves (bigram, partial_count) rows, and
    a per-block partial top-k bounds what the driver merges to
    k·blocks rows. Whitespace tokenization matches the oracle's
    ``regexp_split_to_array(trim(text), '\\s+')``."""
    from collections import Counter

    def partial_counts(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in t["text"].to_pylist():
            toks = (text or "").split()
            counts.update(zip(toks, toks[1:]))
        return pa.table({
            "bigram": pa.array([f"{a} {b}" for a, b in counts],
                               type=pa.string()),
            "n": pa.array(list(counts.values()), type=pa.int64()),
        })

    totals = (_t(sf_dir, "documents", ["text"])
              .map_batches(partial_counts, batch_format="pyarrow")
              .groupby("bigram").aggregate(Sum("n", alias_name="n")))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "bigram"],
                              ascending=[False, True]).head(k)

    reduced = totals.map_batches(partial_topk,
                                 batch_format="pandas").to_pandas()
    out = (reduced.sort_values(["n", "bigram"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    return out


def _word_pairs(t: pa.Table) -> pa.Table:
    """Vectorized tokenize: explode each doc's whitespace-split words
    into (doc_id, word) rows with Arrow list kernels (split → flatten →
    parent-index take), no per-row Python. Empty tokens from
    leading/trailing whitespace are filtered, matching
    ``regexp_split_to_array(trim(text), '\\s+')`` semantics."""
    toks = pc.utf8_split_whitespace(t.column("text").combine_chunks())
    words = pc.list_flatten(toks)
    ids = pc.take(t.column("doc_id"), pc.list_parent_indices(toks))
    mask = pc.not_equal(words, "")
    return pa.table({
        "doc_id": pc.filter(ids, mask).cast(pa.int64()),
        "word": pc.filter(words, mask),
    })


def pmi_bigrams_documents(sf_dir: str) -> pd.DataFrame:
    """Collocation strength (pointwise mutual information) for every
    adjacent word pair in the corpus — the statistic behind phrase
    detection (word2vec-style "new_york" merging). Bigram counts use
    the two-level Counter-partial shape; unigram counts reduce to a
    vocabulary-sized frame; both land on the driver OUTPUT-sized (the
    distinct-bigram table), where the PMI arithmetic is one vectorized
    pass. Emits every bigram (no top-k cut), so no float-ordering
    hazard; pmi rounded to 6 decimals on both sides."""
    from collections import Counter

    def bigram_partials(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in t["text"].to_pylist():
            toks = (text or "").split()
            counts.update(zip(toks, toks[1:]))
        return pa.table({
            "bigram": pa.array([f"{a} {b}" for a, b in counts],
                               type=pa.string()),
            "n": pa.array(list(counts.values()), type=pa.int64()),
        })

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    bc = (docs.map_batches(bigram_partials, batch_format="pyarrow")
          .groupby("bigram").aggregate(Sum("n", alias_name="n"))
          .to_pandas())  # output-sized: the distinct-bigram table

    def unigram_partials(t: pa.Table) -> pa.Table:
        return _word_pairs(t).group_by("word").aggregate([([], "count_all")])

    uc = (docs.map_batches(unigram_partials, batch_format="pyarrow")
          .groupby("word").aggregate(Sum("count_all", alias_name="c"))
          .to_pandas())  # vocabulary-sized
    n_b = int(bc["n"].sum())
    n_u = int(uc["c"].sum())
    u_d = dict(zip(uc["word"], uc["c"].astype(np.int64)))

    halves = bc["bigram"].str.split(" ", n=1, expand=True)
    c1 = halves[0].map(u_d).to_numpy(dtype=np.float64)
    c2 = halves[1].map(u_d).to_numpy(dtype=np.float64)
    cxy = bc["n"].to_numpy(dtype=np.float64)
    pmi = np.log((cxy / n_b) / ((c1 / n_u) * (c2 / n_u)))
    out = pd.DataFrame({"bigram": bc["bigram"],
                        "n_bigram": bc["n"].astype("int64"),
                        "pmi6": np.round(pmi, 6)})
    return out.sort_values("bigram").reset_index(drop=True)


def rare_terms_documents(sf_dir: str) -> pd.DataFrame:
    """TF-IDF-style rarest distinguishing term per document, with the
    ranking kept in integers so the oracle hash-matches exactly: per
    doc, the word with minimal corpus document frequency (tiebreak:
    max in-doc term frequency, then alphabetical).

    Scale shape: one tokenize pass emits complete (doc, word, tf) rows
    (a doc is one input row, so its tf is batch-local); DF is a
    distributed ``groupby(word).count``; DF rides back via a hash join
    on word (NOT a driver-side vocabulary broadcast — web-scale vocab
    doesn't fit one process); the per-doc argmin is ONE hash-combining
    Min aggregate over an order-encoding key (zero-padded df, inverted
    tf, then the word — lexicographic min IS the (df asc, tf desc,
    word asc) winner), so the reduce is partial-combined per block
    instead of a sort shuffle + per-group calls."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def tf_rows(t: pa.Table) -> pa.Table:
        # batch-local tf: a doc is one input row, so its counts are
        # complete within the batch
        return (_word_pairs(t).group_by(["doc_id", "word"])
                .aggregate([([], "count_all")])
                .rename_columns(["doc_id", "word", "tf"]))

    tf = docs.map_batches(tf_rows, batch_format="pyarrow")
    df_counts = tf.groupby("word").aggregate(Count(alias_name="df"))
    joined = hash_join(tf, df_counts, on="word",
                       buckets=join_buckets(_tbytes(sf_dir, "documents")))

    def keyed_partial(t: pa.Table) -> pa.Table:
        # order-encoding key: lexicographic min == ranking winner
        # (df and tf are bounded by the corpus doc count / doc length;
        # 8 digits holds any corpus this engine meets per shard)
        key = pc.binary_join_element_wise(
            pc.utf8_lpad(pc.cast(t["df"], pa.string()), 8, "0"),
            pc.utf8_lpad(pc.cast(pc.subtract(pa.scalar(10 ** 8),
                                             t["tf"]), pa.string()), 8, "0"),
            t["word"].combine_chunks(), "",
        )
        tt = pa.table({"doc_id": t["doc_id"], "key": key})
        # batch-local partial min: one candidate row per (doc, batch)
        return (tt.group_by(["doc_id"]).aggregate([("key", "min")])
                .rename_columns(["doc_id", "key"]))

    out = (joined.map_batches(keyed_partial, batch_format="pyarrow")
           .groupby("doc_id").aggregate(Min("key", alias_name="key"))
           .to_pandas())
    out["df"] = out["key"].str[:8].astype("int64")
    out["tf"] = 10 ** 8 - out["key"].str[8:16].astype("int64")
    out["rare_word"] = out["key"].str[16:]
    out = out.drop(columns=["key"]).sort_values("doc_id")
    out = out.reset_index(drop=True)
    for c in ("doc_id", "df", "tf"):
        out[c] = out[c].astype("int64")
    return out[["doc_id", "rare_word", "df", "tf"]]


# BM25 retrieval: the query-term set is a tiny driver-side constant,
# broadcast into tasks by closure capture (bytes, never a shuffle).
BM25_TERMS = ("hash", "join", "vector")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_documents(sf_dir: str) -> pd.DataFrame:
    """BM25 ranked retrieval (Robertson/Sparck-Jones Okapi BM25, the
    Lucene ``ln(1 + (N-df+0.5)/(df+0.5))`` idf form): score every
    document matching any query term against a fixed term set — the
    search-engine sibling of ``rare_terms_documents`` (per-doc TF-IDF)
    and ``inverted_index_documents`` (the index those lookups hit).

    Scale shape: pass 1 streams the corpus once emitting per-batch
    partials of (|Q|+2) rows each — per-term document frequency plus
    doc/token counts — so the driver reduce is blocks×(|Q|+2) rows and
    there is NO shuffle for the statistics; pass 2 scores each doc
    entirely batch-locally (a doc is one input row, so its tf and dl
    are complete within the batch) with idf/avgdl as broadcast scalar
    constants — the corpus is never shuffled and output is
    matched-docs-sized. Emits every match (no float-ordered top-k
    cut); the total is rounded to 6 decimals on both sides."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    terms_arr = pa.array(list(BM25_TERMS), type=pa.string())

    def stat_partials(t: pa.Table) -> pa.Table:
        wp = _word_pairs(t)
        hit = wp.filter(pc.is_in(wp["word"], value_set=terms_arr))
        per = (hit.group_by(["word", "doc_id"]).aggregate([])
               .group_by("word").aggregate([([], "count_all")])
               .rename_columns(["word", "n"]))
        # sentinel rows carry the corpus scalars; a space cannot occur
        # inside a whitespace-split token, so these never collide
        extra = pa.table({
            "word": pa.array(["# docs", "# tokens"], type=pa.string()),
            "n": pa.array([t.num_rows, wp.num_rows], type=pa.int64()),
        })
        return pa.concat_tables([per, extra])

    st = (docs.map_batches(stat_partials, batch_format="pyarrow")
          .to_pandas().groupby("word", as_index=False)["n"].sum())
    sd = dict(zip(st["word"], st["n"].astype(np.int64)))
    n_docs = int(sd.pop("# docs"))
    avgdl = float(sd.pop("# tokens")) / n_docs
    idf = {w: float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
           for w, df in sd.items()}
    k1, b = BM25_K1, BM25_B

    def score(t: pa.Table) -> pa.Table:
        wp = _word_pairs(t)
        dl = (wp.group_by("doc_id").aggregate([([], "count_all")])
              .rename_columns(["doc_id", "dl"]).to_pandas())
        hit = wp.filter(pc.is_in(wp["word"], value_set=terms_arr))
        tf = (hit.group_by(["doc_id", "word"]).aggregate([([], "count_all")])
              .rename_columns(["doc_id", "word", "tf"]).to_pandas())
        m = tf.merge(dl, on="doc_id")  # batch-local, match-sized
        tfv = m["tf"].to_numpy(dtype=np.float64)
        dlv = m["dl"].to_numpy(dtype=np.float64)
        m["s"] = (m["word"].map(idf).to_numpy()
                  * (tfv * (k1 + 1.0))
                  / (tfv + k1 * (1.0 - b + b * dlv / avgdl)))
        out = m.groupby("doc_id", as_index=False)["s"].sum()
        return pa.table({
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "bm25_6": pa.array(np.round(out["s"].to_numpy(), 6)),
        })

    out = docs.map_batches(score, batch_format="pyarrow").to_pandas()
    if out.empty:  # no doc matches any query term: schema-less empty
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "bm25_6": pd.Series([], dtype="float64")})
    out = out.sort_values("doc_id").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id", "bm25_6"]]


def inverted_index_documents(sf_dir: str) -> pd.DataFrame:
    """Inverted-index construction: word -> sorted posting list of
    doc_ids + document frequency. Postings are comma-joined strings
    (the same layout ``docs_by_lang`` uses) so the oracle compare is
    exact. Per-batch tokenize emits distinct (word, doc) pairs; one
    ``groupby(word)`` assembles each posting list."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        return (_word_pairs(t).group_by(["doc_id", "word"])
                .aggregate([]))  # distinct (doc, word) within the batch

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        return pd.DataFrame({
            "word": [g["word"].iloc[0]],
            "doc_ids": [",".join(map(str, ids))],
            "n_docs": [len(ids)],
        })

    out = (docs.map_batches(pairs, batch_format="pyarrow")
           .groupby("word").map_groups(assemble, batch_format="pandas")
           .to_pandas())
    out = out.sort_values("word").reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    return out[["word", "doc_ids", "n_docs"]]


def doc_components(sf_dir: str) -> pd.DataFrame:
    """Connected components over a document-similarity graph, computed
    with the distributed min-label-propagation kernel the near-dup
    family clusters with (``stages/neardup.py::component_labels``:
    min-label propagation above the pair-count cutoff, one-task
    union-find below it — same min-id labels either way) — exposed as
    a first-class graph operator with an exact recursive oracle.

    Graph: docs are adjacent when they share exact text OR the same
    (lang, n_chars // 50) size bucket; text-dup edges bridge size
    buckets, so components are genuinely transitive (not cliques).

    Scale shape: each equality relation contributes STAR edges
    ((group-min, member) per group — linear in corpus size, never the
    quadratic clique) via one ``groupby().map_groups``; self-edges keep
    singletons addressable; label propagation is one hash join + one
    Min-groupby per round, converging in O(diameter) rounds with a
    scalar-only convergence check on the driver."""
    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])

    def star(g: pd.DataFrame) -> pd.DataFrame:
        m = int(g["doc_id"].min())
        others = g["doc_id"][g["doc_id"] != m]
        return pd.DataFrame({
            "id_a": np.full(len(others), m, dtype=np.int64),
            "id_b": others.to_numpy(dtype=np.int64),
        })

    def bucketed(t: pa.Table) -> pa.Table:
        return t.append_column(
            "size_bucket",
            pc.cast(pc.floor(pc.divide(
                pc.cast(t["n_chars"], pa.float64()), 50.0)), pa.int64()),
        )

    text_edges = docs.groupby("text").map_groups(star, batch_format="pandas")
    size_edges = (docs.map_batches(bucketed, batch_format="pyarrow")
                  .groupby(["lang", "size_bucket"])
                  .map_groups(star, batch_format="pandas"))
    self_edges = docs.map_batches(
        lambda t: pa.table({"id_a": t["doc_id"], "id_b": t["doc_id"]}),
        batch_format="pyarrow",
    )
    pairs = text_edges.union(size_edges).union(self_edges)
    labels = component_labels(pairs)
    out = (labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "component": t["label"]}),
        batch_format="pyarrow",
    ).to_pandas())
    out = out.sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "component"):
        out[c] = out[c].astype("int64")
    return out[["doc_id", "component"]]


def substring_dedup_documents(sf_dir: str, w: int = 8) -> pd.DataFrame:
    """Cross-document exact substring-overlap dedup: flag every doc
    that shares any ``w``-word span with a lower-id doc (the span-level
    exact-dedup family of "Deduplicating Training Data Makes Language
    Models Better", Lee et al. 2022 — the exact sibling of the
    MinHash/SimHash approximate path).

    Scale shape: one tokenize pass emits distinct (shingle, doc) pairs;
    ONE shingle-hash shard shuffle co-locates each span's sightings
    (two-level grouping — a per-shingle group would be the many-tiny-
    groups trap, and the previous ownership-groupby + hash-join-back +
    per-doc-groupby topology paid three wide ops for the same answer);
    inside each shard a vectorized pandas pass resolves ownership
    (transform-min) and reduces to one verdict partial per (shard,
    doc); the driver merges output-sized partials only. Only docs with
    >= w tokens appear (shorter docs have no spans).
    At 100 TB the same topology runs on uint64 rolling-hash shingles
    (constant-width exchange instead of span strings, at the cost of
    hash-collision false positives); strings are kept here so the SQL
    oracle is exact."""
    from ..stages.hashing import hash_strings

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def shingles(t: pa.Table) -> pa.Table:
        ids, shs = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = (text or "").split()
            if len(toks) < w:
                continue
            seen = set()
            for i in range(len(toks) - w + 1):
                s = " ".join(toks[i:i + w])
                if s not in seen:
                    seen.add(s)
                    ids.append(did)
                    shs.append(s)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "sh": pa.array(shs, type=pa.string()),
        })

    shards = 32

    def add_shard(t: pa.Table) -> pa.Table:
        h = hash_strings(np.asarray(t["sh"].to_pylist(), dtype=object))
        return t.append_column(
            "_shard",
            pa.array((h % np.uint64(shards)).astype(np.int32)),
        )

    def shard_flags(g: pd.DataFrame) -> pd.DataFrame:
        # all sightings of a span live in this shard: ownership is a
        # transform-min, the verdict partial a per-doc max — both C-level
        own = g.groupby("sh", sort=False)["doc_id"].transform("min")
        dup = (g["doc_id"].to_numpy() > own.to_numpy()).astype("int64")
        return (pd.DataFrame({"doc_id": g["doc_id"].to_numpy(), "is_dup": dup})
                .groupby("doc_id", sort=False)["is_dup"].max().reset_index())

    partials = (
        docs.map_batches(shingles, batch_format="pyarrow")
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_flags, batch_format="pandas")
        .to_pandas()  # <= shards x docs verdict partials — output-sized
    )
    out = (partials.groupby("doc_id", sort=True)["is_dup"].max()
           .reset_index())
    for c in ("doc_id", "is_dup"):
        out[c] = out[c].astype("int64")
    return out[["doc_id", "is_dup"]]


def pack_documents(sf_dir: str, budget: int = 200,
                   part_size: int = 50) -> pd.DataFrame:
    """Sequence packing for training batches: greedy next-fit
    bin-packing of documents into fixed token-budget sequences, the
    batch-assembly step of an LLM training-data pipeline.

    Packing is inherently sequential, so it runs within partitions:
    the partition key is a pure function of the data (``doc_id //
    part_size``), docs pack in ``doc_id`` order inside each partition
    (one small sequential ``map_groups`` per partition, partitions in
    parallel), and bins never cross partitions — exactly how real
    pipelines shard packing, and what keeps the result deterministic
    and layout-independent. Token counts are vectorized Arrow.
    A doc larger than the budget gets a bin of its own (next-fit
    semantics)."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def with_tokens(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text").combine_chunks())
        n = pc.list_value_length(pc.utf8_split_whitespace(trimmed))
        n = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), n)
        return pa.table({
            "doc_id": t["doc_id"],
            "part": pc.divide(t["doc_id"], part_size),
            "tok": pc.cast(n, pa.int64()),
        })

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        bins = np.empty(len(g), dtype=np.int64)
        fill, b = 0, 0
        for i, tok in enumerate(g["tok"].to_numpy()):
            if i and fill + tok > budget:
                b += 1
                fill = int(tok)
            else:
                fill += int(tok)
            bins[i] = b
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "part": g["part"].to_numpy(),
            "bin": bins,
            "n_tokens": g["tok"].to_numpy(),
        })

    out = (docs.map_batches(with_tokens, batch_format="pyarrow")
           .groupby("part").map_groups(pack, batch_format="pandas")
           .to_pandas())
    out = out.sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "part", "bin", "n_tokens"):
        out[c] = out[c].astype("int64")
    return out[["doc_id", "part", "bin", "n_tokens"]]


def stratified_sample_events(sf_dir: str, per_user: int = 2) -> pd.DataFrame:
    """Stratified (per-group) deterministic sampling: keep ``per_user``
    events per user, chosen by a multiplicative hash of the event id —
    engine-agnostic (any engine computing the same hash keeps the same
    rows, no RNG state to coordinate across workers). Same partial
    top-k shape as ``top3_orders_per_segment``: each batch keeps at most
    ``per_user`` rows per user, the driver merge sees ≤ per_user·users·
    blocks rows — output-sized, never input-sized."""

    def add_hash(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(
            pc.multiply_checked(
                pc.cast(t["event_id"], pa.uint64()),
                pa.scalar(2654435761, type=pa.uint64())),
            pa.scalar((1 << 32) - 1, type=pa.uint64()))
        return t.append_column("_h", pc.cast(h, pa.int64()))

    ds = (_t(sf_dir, "events", ["event_id", "user_id", "ts"])
          .map_batches(add_hash, batch_format="pyarrow"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_h", "event_id"])
        return df.groupby("user_id", sort=False).head(per_user)

    reduced = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = (reduced.sort_values(["_h", "event_id"])
           .groupby("user_id", sort=False).head(per_user)
           .sort_values("event_id").reset_index(drop=True))
    return out[["event_id", "user_id", "ts"]]


_DECON_N = 8  # benchmark-overlap shingle width (words)
_DECON_BENCH_MAX_ID = 10

class _Decontaminator:
    """Plain-task stage: fetch the broadcast benchmark n-gram set once
    per worker process, then count per-document distinct overlapping
    shingles."""

    def __init__(self, grams_ref):
        self.grams_ref = grams_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        grams = broadcast_get(self.grams_ref)
        n = _DECON_N
        hits = np.empty(len(t), dtype=np.int64)
        for j, text in enumerate(t["text"].to_pylist()):
            toks = (text or "").split()
            seen = {" ".join(toks[i:i + n])
                    for i in range(len(toks) - n + 1)}
            hits[j] = len(seen & grams)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_hits": pa.array(hits, type=pa.int64()),
            "contaminated": pa.array((hits > 0).astype(np.int64),
                                     type=pa.int64()),
        })


def decontaminate_documents(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-style training-set
    hygiene pass): flag every document that shares any word 8-gram with
    a held-out benchmark set. The benchmark side is an eval set — tiny
    by nature — so its shingle set is built once and BROADCAST
    (``ray.put``, fetched once per actor) into a map-only membership
    pass over the corpus; the 100-TB side never shuffles. ``n_hits``
    counts *distinct* contaminated 8-grams per doc, matching the
    oracle's ``count(DISTINCT g)``. Here the "benchmark" is the first
    ``_DECON_BENCH_MAX_ID`` documents, so contamination == exact/near
    copies of those docs elsewhere in the corpus."""
    import ray

    bench = (_t(sf_dir, "documents", ["doc_id", "text"])
             .filter(expr=f"doc_id < {_DECON_BENCH_MAX_ID}").take_all())
    bench_grams: set[str] = set()
    for row in bench:
        toks = (row["text"] or "").split()
        for i in range(len(toks) - _DECON_N + 1):
            bench_grams.add(" ".join(toks[i:i + _DECON_N]))
    grams_ref = ray.put(bench_grams)

    out = (_t(sf_dir, "documents", ["doc_id", "text"])
           .map_batches(_Decontaminator(grams_ref),
                        batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def repetition_filter_documents(sf_dir: str) -> pd.DataFrame:
    """Gopher-style within-document repetition quality filter: per doc,
    total vs distinct word-bigram counts and the top-unigram count.
    ``keep_flag`` passes docs whose duplicate-bigram fraction is ≤ 4%,
    computed in INTEGER arithmetic (``25·distinct ≥ 24·total``) so no
    float division/rounding can diverge from the SQL oracle. Pure
    map — one pass per batch, Counter per doc, no shuffle; emitted
    columns are exact integers (hash-safe)."""
    from collections import Counter

    def stats(t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            toks = (text or "").split()
            if not toks:
                continue
            uni = Counter(toks)
            bg = Counter(zip(toks, toks[1:]))
            n_bigrams = len(toks) - 1
            if n_bigrams <= 0:
                continue
            rows.append((doc_id, len(toks), n_bigrams, len(bg),
                         max(uni.values()),
                         int(25 * len(bg) >= 24 * n_bigrams)))
        cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
        return pa.table({
            "doc_id": pa.array(cols[0], type=pa.int64()),
            "n_tokens": pa.array(cols[1], type=pa.int64()),
            "n_bigrams": pa.array(cols[2], type=pa.int64()),
            "n_distinct_bigrams": pa.array(cols[3], type=pa.int64()),
            "top_word_n": pa.array(cols[4], type=pa.int64()),
            "keep_flag": pa.array(cols[5], type=pa.int64()),
        })

    out = (_t(sf_dir, "documents", ["doc_id", "text"])
           .map_batches(stats, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


class _Curator:
    """Fused quality gate for ``curate_documents``: one scan per doc
    computes the repetition stats AND the benchmark-overlap check, and
    drops failing rows *before* the dedup shuffle — the cheap-map-first
    ordering that matters at corpus scale (the shuffle only moves
    surviving rows)."""

    def __init__(self, grams_ref):
        self.grams_ref = grams_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        grams = broadcast_get(self.grams_ref)
        n = _DECON_N
        ids, texts, ntoks = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            toks = (text or "").split()
            if len(toks) < 2:
                continue
            n_big = len(toks) - 1
            nd = len(set(zip(toks, toks[1:])))
            if 25 * nd < 24 * n_big:  # duplicate-bigram fraction > 4%
                continue
            doc_grams = {" ".join(toks[i:i + n])
                         for i in range(len(toks) - n + 1)}
            if doc_grams & grams:  # shares an 8-gram with the bench
                continue
            ids.append(doc_id)
            texts.append(text)
            ntoks.append(len(toks))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "n_tokens": pa.array(ntoks, type=pa.int64()),
        })


def curate_documents(sf_dir: str) -> pd.DataFrame:
    """End-to-end training-corpus curation — the composition every
    LLM-data pipeline actually ships: repetition quality filter +
    benchmark decontamination (both fused into ONE map scan, broadcast
    benchmark set, rows dropped before any shuffle) followed by exact
    text dedup (hash-shard groupby, min doc_id survives). Returns the
    surviving (doc_id, n_tokens) — the manifest of the curated corpus."""
    import ray

    bench = (_t(sf_dir, "documents", ["doc_id", "text"])
             .filter(expr=f"doc_id < {_DECON_BENCH_MAX_ID}").take_all())
    bench_grams: set[str] = set()
    for row in bench:
        toks = (row["text"] or "").split()
        for i in range(len(toks) - _DECON_N + 1):
            bench_grams.add(" ".join(toks[i:i + _DECON_N]))
    grams_ref = ray.put(bench_grams)

    kept = (_t(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(_Curator(grams_ref), batch_format="pyarrow"))
    out = (exact_dedup(kept, key_cols=["text"], order_cols=["doc_id"])
           .select_columns(["doc_id", "n_tokens"]).to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


# --- training-data ops: chunking / splits / balancing / novelty / pairs --


def chunk_documents(sf_dir: str, chunk: int = 32,
                    stride: int = 24) -> pd.DataFrame:
    """Fixed-size token chunking with overlap — the op that turns a
    document corpus into training sequences (chunk=32 words, stride=24,
    i.e. 8 words of overlap). One pure flat-map, fully vectorized: the
    per-batch kernel never touches a Python row — split to a ListArray,
    build the (row, start) grid in numpy, gather the flat word values
    once, and re-join each chunk with ``pc.binary_join``. At 100 TB this
    is a streaming map with no shuffle; output rows carry (doc_id,
    chunk_idx) so downstream packing/shuffling can key on them."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "chunk_idx": pa.array([], pa.int64()),
                      "chunk_text": pa.array([], pa.string()),
                      "n_words": pa.array([], pa.int64())})

    def chunks(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        la = pc.split_pattern(t["text"], " ").combine_chunks()
        flat = la.values
        offs = la.offsets.to_numpy().astype(np.int64)
        nw = np.diff(offs)
        # (row, chunk) grid: starts step by `stride`, every start < n_words
        max_chunks = int(np.ceil(nw.max() / stride)) if nw.max() else 1
        grid = np.arange(max_chunks, dtype=np.int64) * stride
        row_idx, chunk_pos = np.nonzero(grid[None, :] < nw[:, None])
        starts = grid[chunk_pos]
        cs = offs[row_idx] + starts                      # flat-coord begin
        ce = np.minimum(cs + chunk, offs[row_idx + 1])   # clipped end
        lengths = ce - cs
        out_offs = np.concatenate([[0], np.cumsum(lengths)])
        idx = (np.arange(out_offs[-1], dtype=np.int64)
               - np.repeat(out_offs[:-1], lengths) + np.repeat(cs, lengths))
        gathered = flat.take(pa.array(idx, type=pa.int64()))
        lst = pa.LargeListArray.from_arrays(
            pa.array(out_offs, type=pa.int64()), gathered)
        return pa.table({
            "doc_id": t["doc_id"].take(pa.array(row_idx, pa.int64())),
            "chunk_idx": pa.array(chunk_pos, pa.int64()),
            "chunk_text": pc.binary_join(lst, " "),
            "n_words": pa.array(lengths, pa.int64()),
        })

    out = docs.map_batches(chunks, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


# Knuth multiplicative hash (stages/hashing.py::multiplicative_hash_u32
# — one copy of the load-bearing constant, shared with
# deterministic_sample and the SQL oracles' arithmetic form
# ``(id * 2654435761) % 4294967296``). The 100 TB variant is the same
# trick on a splitmix64 of a content hash.
def _doc_hash(ids: np.ndarray) -> np.ndarray:
    from ..stages.hashing import multiplicative_hash_u32
    return multiplicative_hash_u32(ids).astype(np.int64)


def weighted_sample_documents(sf_dir: str) -> pd.DataFrame:
    """Quality-weighted deterministic sampling (DCLM-style: sample
    higher-quality documents at a higher rate instead of hard
    filtering). Weight w in 1..4 derives from doc length
    (``(n_chars // 100) % 4 + 1`` — data-defined so the oracle computes
    it too); a doc survives iff ``hash(doc_id) < w * (2^32 // 8)``, so
    inclusion probability is w/8 — proportional to weight, all integer
    arithmetic, reproducible across engines and cluster layouts.
    Embarrassingly parallel: one vectorized mask per batch, no shuffle;
    downstream estimators reweight by 8/w (Horvitz-Thompson)."""
    docs = _t(sf_dir, "documents", ["doc_id", "n_chars"])
    base = np.uint64(2 ** 32) // np.uint64(8)

    def mask(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        w = (df["n_chars"].to_numpy(np.int64) // 100) % 4 + 1
        from ..stages.hashing import multiplicative_hash_u32
        keep = multiplicative_hash_u32(ids) < w.astype(np.uint64) * base
        out = df[keep].copy()
        out["weight"] = w[keep]
        return out

    out = docs.map_batches(mask, batch_format="pandas").to_pandas()
    if out.empty:  # all-empty blocks arrive schema-less
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_chars": pd.Series(dtype="int64"),
                             "weight": pd.Series(dtype="int64")})
    out = out.sort_values("doc_id").reset_index(drop=True)
    out["weight"] = out["weight"].astype("int64")
    return out[["doc_id", "n_chars", "weight"]]


def split_documents(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test assignment — hash-bucket split
    (5% test, 10% val, 85% train) as a pure vectorized map: stable
    under reshuffling, appends, and cluster size, because the split is
    a function of the key alone, never of row position."""
    docs = _t(sf_dir, "documents", ["doc_id", "lang"])

    def assign(t: pa.Table) -> pa.Table:
        b = _doc_hash(t["doc_id"].to_numpy()) % 100
        split = np.where(b < 5, "test", np.where(b < 15, "val", "train"))
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "split": pa.array(split.astype(object),
                                           pa.string())})

    out = docs.map_batches(assign, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def lang_balanced_documents(sf_dir: str, cap: int = 30) -> pd.DataFrame:
    """Language-balanced corpus cap: keep at most ``cap`` docs per lang,
    chosen by deterministic hash priority (not arrival order, so the
    pick is layout- and cluster-size-independent). Partial top-k shape:
    each batch keeps its own ``cap`` smallest (lang, priority) rows, the
    final per-lang reduce sees at most blocks x cap rows — the corpus
    itself never sorts or shuffles whole."""
    docs = _t(sf_dir, "documents", ["doc_id", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_h=_doc_hash(df["doc_id"].to_numpy()))
        return (df.sort_values(["_h", "doc_id"]).groupby("lang", sort=False)
                .head(cap))

    # final reduce is output-sized (<= blocks x langs x cap rows), so a
    # driver merge beats a groupby shuffle — same diet as priority_revenue
    cand = docs.map_batches(partial, batch_format="pandas").to_pandas()
    out = (cand.sort_values(["_h", "doc_id"]).groupby("lang", sort=False)
           .head(cap)[["doc_id", "lang"]])
    return out.sort_values("doc_id").reset_index(drop=True)


def mix_documents(sf_dir: str) -> pd.DataFrame:
    """Corpus mixture resampling (Pile/Dolma-style source mixing): pick
    the largest subcorpus whose per-source composition matches a target
    weight vector exactly, never upsampling — the step that turns raw
    crawl sources into a training mixture. Weights derive from the
    source name (``(int suffix % 4) + 1``) so the target is data-defined
    and expressible in the SQL oracle; all mixture arithmetic is integer
    (floor) so caps match the oracle bit-for-bit.

    Scale shape: per-source counts come from per-batch partial groupbys
    reduced on a sources-sized driver frame (a corpus has thousands of
    sources, not billions); selection is the hash-priority partial
    top-k of ``lang_balanced_documents`` with per-source caps — each
    batch keeps at most cap_s rows per source, the driver reduce sees
    blocks x Σcap candidate rows, and the corpus itself never sorts or
    shuffles whole."""
    docs = _t(sf_dir, "documents", ["doc_id", "source"])

    counts = (docs.map_batches(
        lambda df: df.groupby("source", as_index=False)
                     .agg(c=("doc_id", "count")),
        batch_format="pandas")
        .to_pandas().groupby("source", as_index=False)["c"].sum())
    wt = counts["source"].str[3:].astype(np.int64) % 4 + 1
    total_w = int(wt.sum())
    # largest total T with floor(w_s/W * T) <= c_s for every source
    feasible = (counts["c"].astype(np.int64) * total_w) // wt
    t_max = int(feasible.min())
    cap = dict(zip(counts["source"],
                   ((wt * t_max) // total_w).astype(np.int64)))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_h=_doc_hash(df["doc_id"].to_numpy()),
                       _cap=df["source"].map(cap))
        df = df.sort_values(["_h", "doc_id"])
        keep = df.groupby("source", sort=False).cumcount() < df["_cap"]
        return df[keep.to_numpy()]

    cand = docs.map_batches(partial, batch_format="pandas").to_pandas()
    if cand.empty:  # infeasible mixture (a cap of 0 everywhere):
        # all-empty blocks arrive schema-less, so rebuild the columns
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "source": pd.Series(dtype=object)})
    cand = cand.sort_values(["_h", "doc_id"])
    keep = cand.groupby("source", sort=False).cumcount() < cand["_cap"]
    out = cand[keep.to_numpy()][["doc_id", "source"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def novel_documents(sf_dir: str) -> pd.DataFrame:
    """Cross-corpus novelty: keep new-crawl docs (upper doc_id half)
    whose 8-word prefix signature never appeared in the previous crawl
    (lower half) — incremental-crawl dedup, the other direction of
    decontamination. Scale shape: the reference side folds into a
    distributed Bloom (raw keys never collect anywhere); definite
    non-members pass with zero join work; only the ~fp_rate+hit sliver
    goes through the exact hash anti-join, preserving exactness."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def with_prefix(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        pre = pc.binary_join(pc.list_slice(words, 0, 8), " ")
        return pa.table({"doc_id": t["doc_id"], "prefix": pre})

    # materialize the REDUCED projection (doc_id + 8-word prefix, ~50
    # bytes/row vs the corpus's KBs): four downstream consumers (max,
    # bloom build, two probes) would otherwise each re-read and re-split
    # the full text column. This is the justified materialization —
    # output-proportional, never the corpus itself.
    keyed = docs.map_batches(with_prefix,
                             batch_format="pyarrow").materialize()
    cut = int(keyed.max("doc_id")) // 2
    ref = keyed.filter(expr=f"doc_id < {cut}")
    new = keyed.filter(expr=f"doc_id >= {cut}")

    from ..stages.sketches import bloom_semi_join, build_bloom
    bloom = build_bloom(ref, "prefix", n_items_hint=max(64, cut))
    definite = bloom_semi_join(new, bloom, "prefix", anti=True)
    maybe = bloom_semi_join(new, bloom, "prefix")  # hits + false positives

    # exact verify of the sliver: tagged union + ONE hash co-partition on
    # prefix SHARDS (16 vectorized group passes instead of one pandas
    # call per distinct prefix) — a new row survives iff no reference
    # row in its shard shares its prefix
    from ..stages.hashing import add_shard_column

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            t = pa.table({
                "prefix": t["prefix"], "doc_id": t["doc_id"],
                "_side": pa.array([side] * len(t), pa.int8()),
            })
            return add_shard_column(t, "prefix", 16)
        return f

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        ref_pre = g.loc[g["_side"] == 0, "prefix"]
        keep = g[(g["_side"] == 1) & ~g["prefix"].isin(ref_pre)]
        return keep[["doc_id"]]

    survivors = (
        ref.map_batches(tag(0), batch_format="pyarrow")
        .union(maybe.map_batches(tag(1), batch_format="pyarrow"))
        .groupby("_shard").map_groups(verify, batch_format="pandas")
    )
    out = definite.select_columns(["doc_id"]).union(survivors).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def cosine_pairs_embeddings(sf_dir: str, tau: float = 0.42) -> pd.DataFrame:
    """Exact cosine pair mining: every unordered vector pair with
    cosine >= tau. The corpus doubles as the broadcast side (``ray.put``
    of the L2-normalized matrix, read once per task), each batch does
    one ``rows @ matrix.T`` matmul and keeps the masked upper triangle —
    O(n^2) flops but vectorized and embarrassingly parallel. This is
    the exact baseline; ``embedding_dedup`` (hyperplane LSH) and
    ``similarity_join`` are the 100 TB paths when n^2 is off the table."""
    import ray

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    emb = emb.sort_values("vec_id")
    ids = emb["vec_id"].to_numpy()
    X = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    mat_ref = ray.put((ids, X))

    def pairs(t: pa.Table) -> pa.Table:
        all_ids, mat = ray.get(mat_ref)
        rid = t["vec_id"].to_numpy()
        # this batch's normalized rows already live in the broadcast
        # matrix — slice them out instead of re-reading/re-normalizing
        q = mat[np.searchsorted(all_ids, rid)]
        sims = q @ mat.T
        # unordered pairs once: this row is the smaller id of the pair
        keep = (sims >= tau) & (rid[:, None] < all_ids[None, :])
        r, c = np.nonzero(keep)
        return pa.table({
            "vec_id_a": pa.array(rid[r], pa.int64()),
            "vec_id_b": pa.array(all_ids[c], pa.int64()),
            "cos4": pa.array(np.round(sims[r, c], 4), pa.float64()),
        })

    out = (_t(sf_dir, "embeddings", ["vec_id"])
           .map_batches(pairs, batch_format="pyarrow").to_pandas())
    return out.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)


def quality_model_documents(sf_dir: str, threshold: int = 1100) -> pd.DataFrame:
    """Model-based quality scoring over the corpus: a linear scorer on
    (distinct words, repeated words, non-space chars) with weights
    broadcast via ``ray.put`` and read zero-copy inside each task — the
    shape of every batched-inference stage (tokenize -> featurize ->
    score) with a bit-exact SQL twin. Plain tasks, not an actor pool:
    the "model" here is three ints, so per-actor setup buys nothing
    (the repo's actor-pool inference pattern — load once in
    ``__init__`` — lives where the state is real: ``_Curator``'s gram
    set, the multimodal decoders)."""
    import ray

    weights_ref = ray.put(np.array([50, -10, 1], dtype=np.int64))

    def score_batch(t: pa.Table) -> pa.Table:
        w = ray.get(weights_ref)  # object-store read, shared per node
        words = pc.split_pattern(t["text"], " ").combine_chunks()
        n_tokens = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = words.flatten().to_pandas()
        rid = np.repeat(np.arange(len(t)), n_tokens)
        n_distinct = (flat.groupby(rid).nunique()
                      .reindex(np.arange(len(t)), fill_value=0)
                      .to_numpy().astype(np.int64))
        n_chars = (pc.utf8_length(t["text"]).to_numpy().astype(np.int64)
                   - pc.count_substring(t["text"], " ").to_numpy())
        score = (w[0] * n_distinct + w[1] * (n_tokens - n_distinct)
                 + w[2] * n_chars)
        return pa.table({
            "doc_id": t["doc_id"],
            "score": pa.array(score, pa.int64()),
            "kept": pa.array((score >= threshold).astype(np.int64),
                             pa.int64()),
        })

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def featurize_documents(sf_dir: str, n_buckets: int = 16) -> pd.DataFrame:
    """Feature hashing (count-vectorizer) over the corpus: each word
    lands in ``(first_codepoint * 31 + len(word)) % n_buckets`` and the
    doc's feature vector is the bucket-count histogram — the hashing
    trick that turns unbounded vocabularies into fixed-width vectors
    with zero global state (no vocabulary shuffle, no driver dict).
    Pure vectorized map: codepoints via a numpy view, counts via one
    ``bincount`` per batch."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    cols = [f"f{i}" for i in range(n_buckets)]

    def featurize(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ").combine_chunks()
        n_tokens = pc.list_value_length(words).to_numpy().astype(np.int64)
        flat = words.flatten()
        lens = pc.utf8_length(flat).to_numpy().astype(np.int64)
        u = flat.to_numpy(zero_copy_only=False).astype("U")
        # first codepoint of each word without a row loop: the U-dtype
        # buffer is fixed-width UTF-32, so column 0 of the uint32 view
        # IS the first character (0 for empty strings)
        width = u.dtype.itemsize // 4
        firsts = (u.view(np.uint32).reshape(len(u), width)[:, 0]
                  .astype(np.int64) if len(u) else np.array([], np.int64))
        bkt = (firsts * 31 + lens) % n_buckets
        rid = np.repeat(np.arange(len(t), dtype=np.int64), n_tokens)
        counts = np.bincount(rid * n_buckets + bkt,
                             minlength=len(t) * n_buckets)
        counts = counts.reshape(len(t), n_buckets)
        data = {"doc_id": t["doc_id"]}
        for i, c in enumerate(cols):
            data[c] = pa.array(counts[:, i], pa.int64())
        return pa.table(data)

    out = docs.map_batches(featurize, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# --- streaming engine showcase (rows-only; pages aren't a DuckDB view) --


def streaming_flagship(sf_dir: str) -> pd.DataFrame:
    """Full streaming pipeline (extract -> filter -> dedup -> as-of join
    -> windows -> exactly-once sink) on a deterministic synthetic pages
    log sized to the sf tier."""
    import shutil

    from ..config import EngineConfig
    from ..pipelines.flagship import ensure_pages_log, flagship_outputs, run_flagship
    from ..sources.pages import PagesSpec

    tier = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    rows = 6000 if tier.endswith("0.01") else 2000
    data_dir = f"/tmp/bitquery_kafka_streams_rust_ray_pages_{tier}_{rows}"
    ensure_pages_log(data_dir, PagesSpec(num_rows=rows))
    out_dir = f"{data_dir}_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = EngineConfig(min_text_len=1, state_shards=8, extract_concurrency=4)
    run_flagship(data_dir, out_dir, config=cfg, resume=False)
    res = flagship_outputs(out_dir)["tumbling_lang"].to_pandas()
    return res.sort_values(["key", "window_start"]).reset_index(drop=True)


def qte_purchase_view(sf_dir: str) -> pd.DataFrame:
    """Quantile treatment effect: the difference of purchase-vs-view
    value quantiles at p10/p50/p90, read from the same two distinct-
    value cents histograms as the KS/Wasserstein drift family — the
    distributional companion to the mean-difference A/B readout
    (effects that live in the tails never show in means)."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"],
                     value_set=pa.array(["purchase", "view"]))
        t = t.filter(m)
        cents = np.round(t["value"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        return (pa.table({"event_type": t["event_type"],
                          "cents": pa.array(cents)})
                .group_by(["event_type", "cents"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "cents", "n"]))

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n")).to_pandas())

    def q(evt: str, pct: int) -> int:
        sub = hist[hist["event_type"] == evt].sort_values("cents")
        cum = sub["n"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        return int(sub["cents"].to_numpy(np.int64)[
            np.searchsorted(cum, (pct * n + 99) // 100)])

    rows = [(p, q("purchase", p), q("view", p),
             q("purchase", p) - q("view", p)) for p in (10, 50, 90)]
    out = pd.DataFrame(rows, columns=["pct", "purchase_cents",
                                      "view_cents", "qte_cents"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("pct").reset_index(drop=True)


def negative_samples(sf_dir: str, k: int = 3, pool: int = 64
                     ) -> pd.DataFrame:
    """Deterministic negative sampling (the recsys/retrieval training
    op): for every customer, the ``k`` smallest-hash parts they never
    purchased, drawn from a GLOBAL candidate pool of the ``pool``
    smallest-hash parts. The hash ordering is one broadcast list — the
    same for every user — so generation is a per-group set-difference
    against the pool, never a user x parts cross join; SQL mirrors the
    pool contract exactly."""
    from ..stages.hashing import multiplicative_hash_u32

    parts = _t(sf_dir, "part", ["p_partkey"]).to_pandas()
    pk = parts["p_partkey"].to_numpy(np.int64)
    hv = multiplicative_hash_u32(pk).astype(np.int64)
    order = np.lexsort((pk, hv))[:pool]
    pool_parts = pk[order]          # global candidate list in hash order
    pool_ref = ray.put(pool_parts)

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    od = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    omap = od.to_pandas().sort_values("o_orderkey")
    oref = ray.put((omap["o_orderkey"].to_numpy(np.int64),
                    omap["o_custkey"].to_numpy(np.int64)))

    def cust_part(t: pa.Table) -> pa.Table:
        ok, oc = broadcast_get(oref)
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False
                                        ).astype(np.int64)
        pos = np.searchsorted(ok, keys)
        return (pa.table({"custkey": pa.array(oc[pos]),
                          "partkey": t["l_partkey"]})
                .group_by(["custkey", "partkey"]).aggregate([]))

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        cand = broadcast_get(pool_ref)
        bought = set(g["partkey"].to_numpy(np.int64).tolist())
        negs = [p for p in cand if int(p) not in bought][:k]
        return pd.DataFrame({
            "custkey": np.full(len(negs), int(g["custkey"].iloc[0]),
                               dtype=np.int64),
            "neg_partkey": np.array(negs, np.int64),
            "k": np.arange(1, len(negs) + 1, dtype=np.int64)})

    out = (li.map_batches(cust_part, batch_format="pyarrow")
           .groupby("custkey").map_groups(per_cust, batch_format="pandas")
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return (out.sort_values(["custkey", "k"]).reset_index(drop=True))


def minhash_eval_documents(sf_dir: str) -> pd.DataFrame:
    """Sketch-quality evaluation as an operator: precision/recall of
    the MinHash-LSH candidate generator against the EXACT char-trigram
    Jaccard >= 0.8 ground truth, within lang blocks (the frame both
    sides share). The pipeline-health audit a near-dup deployment runs
    when tuning (num_perm, bands): counts are exact integers, ratios
    half-away ppm. Rows-only by nature (the sketch side is not ANSI
    SQL); recall is pinned >= 0.95 by pytest — the LSH collision bound
    1-(1-s^r)^b at s=0.8, r=4, b=16 predicts ~0.9998."""
    from ..stages.neardup import minhash_candidates, ngram_jaccard_pairs

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])
    truth = ngram_jaccard_pairs(ds, threshold=0.8, block_col="lang")
    tset = set(zip(truth["id_a"].astype(np.int64),
                   truth["id_b"].astype(np.int64)))

    # id -> lang map (two narrow columns; diagnostic-op scale)
    lm = _t(sf_dir, "documents", ["doc_id", "lang"]).to_pandas()
    lang = pd.Series(lm["lang"].to_numpy(),
                     index=lm["doc_id"].to_numpy(np.int64))
    cands = minhash_candidates(ds, ngram=3, shingle="char").to_pandas()
    a = cands["id_a"].to_numpy(np.int64)
    b = cands["id_b"].to_numpy(np.int64)
    same_lang = (lang.loc[a].to_numpy() == lang.loc[b].to_numpy())
    pairs = {(min(x, y), max(x, y))
             for x, y in zip(a[same_lang], b[same_lang])}
    tp = len(pairs & tset)
    n_c, n_t = len(pairs), len(tset)
    prec = (2 * tp * 1_000_000 + n_c) // (2 * n_c) if n_c else 0
    rec = (2 * tp * 1_000_000 + n_t) // (2 * n_t) if n_t else 1_000_000
    return pd.DataFrame({
        "n_truth": np.array([n_t], np.int64),
        "n_candidates": np.array([n_c], np.int64),
        "true_positives": np.array([tp], np.int64),
        "precision_ppm": np.array([int(prec)], np.int64),
        "recall_ppm": np.array([int(rec)], np.int64)})


def join_card_estimate(sf_dir: str) -> pd.DataFrame:
    """Optimizer-internals audit: the textbook equi-join cardinality
    estimate |A JOIN B| ~= n_a * n_b / max(ndv_a, ndv_b) vs the actual
    join size, per FK edge — both exact integers (estimate rounded
    half-away), error in ppm of actual. The estimator a cost-based
    planner uses before picking broadcast vs shuffle; inputs reduce to
    per-block (count, distinct) partials, the actual size to a
    key-count dot product, so nothing rows-sized reaches the driver."""
    edges = [
        ("orders*customer@custkey", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("lineitem*orders@orderkey", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem*part@partkey", "lineitem", "l_partkey",
         "part", "p_partkey"),
    ]
    rows = []
    for name, lt, lk, rt, rk in edges:
        def keycounts(tbl, col):
            return (_t(sf_dir, tbl, [col])
                    .map_batches(lambda t, c=col: (
                        pa.table({"k": t[c]})
                        .group_by("k").aggregate([([], "count_all")])
                        .rename_columns(["k", "n"])),
                        batch_format="pyarrow")
                    .groupby("k").aggregate(Sum("n", alias_name="n"))
                    .to_pandas())
        lc, rc = keycounts(lt, lk), keycounts(rt, rk)
        n_l, n_r = int(lc["n"].sum()), int(rc["n"].sum())
        ndv_l, ndv_r = len(lc), len(rc)
        mx = max(ndv_l, ndv_r)
        est = (2 * n_l * n_r + mx) // (2 * mx)
        j = lc.merge(rc, on="k", suffixes=("_l", "_r"))
        actual = int((j["n_l"].astype(object)
                      * j["n_r"].astype(object)).sum())
        err = (2 * abs(est - actual) * 1_000_000 + actual) // (2 * actual)
        rows.append((name, n_l, n_r, ndv_l, ndv_r, int(est), actual,
                     int(err)))
    out = pd.DataFrame(rows, columns=[
        "edge", "n_left", "n_right", "ndv_left", "ndv_right",
        "est_rows", "actual_rows", "err_ppm"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out.sort_values("edge").reset_index(drop=True)


def fuzzy_name_components(sf_dir: str) -> pd.DataFrame:
    """Entity resolution: cluster the blocked-Levenshtein match graph
    (`fuzzy_name_pairs_parts`'s edges) into entities via the shared
    connected-components kernel, emitting one row per multi-member
    entity (root = lexicographically smallest member). The classic
    dedupe-then-cluster shape of record linkage: distributed pair
    mining bounds the graph to actual matches, so the clustering runs
    on the match count, never the name domain."""
    pairs = fuzzy_name_pairs_parts(sf_dir)
    if not len(pairs):
        return pd.DataFrame({"root": pd.Series([], dtype=str),
                             "n_members": pd.Series([], dtype=np.int64)})
    names = np.unique(np.concatenate([pairs["name_a"].to_numpy(),
                                      pairs["name_b"].to_numpy()]))
    idx = {n: i for i, n in enumerate(names)}  # sorted -> min id == min name
    e = rd.from_arrow(pa.table({
        "id_a": pa.array([idx[n] for n in pairs["name_a"]], pa.int64()),
        "id_b": pa.array([idx[n] for n in pairs["name_b"]], pa.int64())}))
    labels = component_labels(e).to_pandas()
    labels["root"] = names[labels["label"].to_numpy(np.int64)]
    out = (labels.groupby("root").size().reset_index(name="n_members"))
    out = out[out["n_members"] >= 2]
    out["n_members"] = out["n_members"].astype("int64")
    return out.sort_values("root").reset_index(drop=True)


def expectations_audit(sf_dir: str) -> pd.DataFrame:
    """Declared-constraint audit (the dbt-test / expectations-suite
    operator): each table streams once through vectorized boolean
    checks, one (rule, n_rows, n_violations) row per rule. The
    cross-table rule (lineitem ships before its order date) joins
    broadcast-side on the orders date map. Violation counts are exact
    integer partials — the shuffle carries 2 ints per (block, rule)."""
    rows = []

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate"])
    od = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

    omap = od.map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                            "d": pa.array(np.asarray(
                                column_ts_us(pc.cast(t["o_orderdate"],
                                             pa.timestamp("us")))))}),
        batch_format="pyarrow").to_pandas().sort_values("o_orderkey")
    # broadcast sorted (key, date) arrays: the per-batch lookup is one
    # vectorized searchsorted, never a per-row dict probe
    date_ref = ray.put((omap["o_orderkey"].to_numpy(np.int64),
                        omap["d"].to_numpy(np.int64)))

    def li_checks(t: pa.Table) -> pa.Table:
        n = len(t)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        px = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        ship = np.asarray(column_ts_us(pc.cast(t["l_shipdate"],
                                               pa.timestamp("us"))))
        okeys, odates = broadcast_get(date_ref)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(okeys, ok)
        pos = np.clip(pos, 0, len(okeys) - 1)
        odate = np.where(okeys[pos] == ok, odates[pos], -(1 << 62))
        return pa.table({
            "rule": pa.array(["l_quantity_positive",
                                    "l_extendedprice_positive",
                                    "ship_on_or_after_order"]),
            "n_rows": pa.array([n, n, n], pa.int64()),
            "n_violations": pa.array(
                [int((qty <= 0).sum()), int((px <= 0).sum()),
                 int((ship < odate).sum())], pa.int64())})

    def od_checks(t: pa.Table) -> pa.Table:
        n = len(t)
        tp = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "rule": pa.array(["o_totalprice_positive"]),
            "n_rows": pa.array([n], pa.int64()),
            "n_violations": pa.array([int((tp <= 0).sum())], pa.int64())})

    docs = _t(sf_dir, "documents", ["text", "n_chars"])

    def doc_checks(t: pa.Table) -> pa.Table:
        n = len(t)
        stored = t["n_chars"].to_numpy(zero_copy_only=False)
        actual = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False)
        return pa.table({
            "rule": pa.array(["n_chars_matches_text"]),
            "n_rows": pa.array([n], pa.int64()),
            "n_violations": pa.array([int((stored != actual).sum())],
                                     pa.int64())})

    for ds_, fn in ((li, li_checks), (od, od_checks), (docs, doc_checks)):
        part = (ds_.map_batches(fn, batch_format="pyarrow")
                .groupby("rule")
                .aggregate(Sum("n_rows", alias_name="n_rows"),
                           Sum("n_violations", alias_name="n_violations"))
                .to_pandas())
        rows.append(part)
    out = pd.concat(rows, ignore_index=True)
    for c in ("n_rows", "n_violations"):
        out[c] = out[c].astype("int64")
    return out.sort_values("rule").reset_index(drop=True)


def ri_audit(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity audit over every foreign-key edge of the
    star schema: child-side distinct keys reduce per block, the parent
    key set broadcasts (dimension tables are small sides by
    construction), and orphans count as an anti-membership test — the
    generalized form of `orders_without_lineitem`, run as one summary
    table (edge, n_child_rows, n_orphans) like a warehouse RI monitor."""
    edges = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]
    rows = []
    for name, child, ck, parent, pk in edges:
        keys = np.sort(_t(sf_dir, parent, [pk]).to_pandas()[pk]
                       .to_numpy(np.int64))
        kref = ray.put(keys)

        def check(t: pa.Table, *, _ck=ck, _kref=kref) -> pa.Table:
            ks = broadcast_get(_kref)  # sorted key array, once per worker
            vals = t[_ck].to_numpy(zero_copy_only=False).astype(np.int64)
            orphan = int((~np.isin(vals, ks,
                                   assume_unique=False)).sum())
            return pa.table({"n": pa.array([len(t)], pa.int64()),
                             "orphans": pa.array([orphan], pa.int64())})

        agg = (_t(sf_dir, child, [ck])
               .map_batches(check, batch_format="pyarrow")
               .to_pandas().sum())
        rows.append((name, int(agg["n"]), int(agg["orphans"])))
    out = pd.DataFrame(rows, columns=["edge", "n_child_rows", "n_orphans"])
    for c in ("n_child_rows", "n_orphans"):
        out[c] = out[c].astype("int64")
    return out.sort_values("edge").reset_index(drop=True)


def markov_entropy_rate(sf_dir: str) -> pd.DataFrame:
    """Entropy rate of the per-user event-type chain: per from-state
    contribution H_i = -sum_j (n_ij/N) ln(n_ij/n_i.) over the same
    sharded transition counts as `markov_transitions_events` — the
    information-theoretic predictability score of user behavior (low
    entropy = bot-like deterministic sequences). Reduced frame is
    alphabet²-sized; entropy computes driver-side, rounded to 6."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())),
                        pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy()
        if len(t) < 2:
            return pd.DataFrame({"from_type": pd.Series([], dtype=str),
                                 "to_type": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        same = u[:-1] == u[1:]
        pairs = pd.DataFrame({"from_type": t[:-1][same],
                              "to_type": t[1:][same]})
        out = (pairs.groupby(["from_type", "to_type"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype(np.int64)
        return out

    tc = (ds.map_batches(sharded, batch_format="pyarrow")
          .groupby("_shard").map_groups(per_shard, batch_format="pandas")
          .to_pandas()
          .groupby(["from_type", "to_type"], sort=True)["n"]
          .sum().reset_index())
    nn = float(tc["n"].sum())
    row = tc.groupby("from_type")["n"].transform("sum").to_numpy(np.float64)
    n = tc["n"].to_numpy(np.float64)
    tc["h"] = -(n / nn) * np.log(n / row)
    out = (tc.groupby("from_type", sort=True)
           .agg(n_transitions=("n", "sum"), h=("h", "sum"))
           .reset_index())
    out["h_contrib_6"] = np.round(out["h"], 6)
    out["n_transitions"] = out["n_transitions"].astype("int64")
    return out[["from_type", "n_transitions",
                "h_contrib_6"]].reset_index(drop=True)


def mase_backtest_daily(sf_dir: str) -> pd.DataFrame:
    """Seasonal-naive forecast backtest (MASE): on the reduced daily
    revenue series, the seasonal-naive forecast (value 7 days earlier)
    scores against the naive one (previous day) as the exact integer
    ratio of absolute-error sums, half-away ppm — the baseline every
    forecasting pipeline must beat before shipping a model. Only days
    where BOTH lags exist enter either sum, so the ratio compares like
    for like."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        dus = (np.asarray(column_ts_us(day)) // DAY_US) * DAY_US
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100).astype(np.int64)
        return (pa.table({"day_us": pa.array(dus), "cents": pa.array(cents)})
                .group_by("day_us").aggregate([("cents", "sum")])
                .rename_columns(["day_us", "cents"]))

    d = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby("day_us").aggregate(Sum("cents", alias_name="cents"))
         .to_pandas().sort_values("day_us"))
    s = dict(zip(d["day_us"].astype(np.int64), d["cents"].astype(object)))
    s1 = s7 = 0
    n_days = 0
    for day, v in s.items():
        p1, p7 = s.get(day - DAY_US), s.get(day - 7 * DAY_US)
        if p1 is None or p7 is None:
            continue
        n_days += 1
        s1 += abs(v - p1)
        s7 += abs(v - p7)
    mase_ppm = int((2 * s7 * 1_000_000 + s1) // (2 * s1)) if s1 else 0
    return pd.DataFrame({
        "n_days": np.array([n_days], np.int64),
        "naive_mae_cents": np.array([int(s1)], np.int64) if n_days else
        np.array([0], np.int64),
        "seasonal_mae_cents": np.array([int(s7)], np.int64),
        "mase_ppm": np.array([mase_ppm], np.int64)})


def cap_per_source_documents(sf_dir: str, cap: int = 50) -> pd.DataFrame:
    """Per-source quota enforcement (the RefinedWeb/C4-style domain cap
    that stops one host from dominating the corpus): keep at most
    ``cap`` docs per source, selected by the SQL-mirrorable
    multiplicative hash of doc_id (deterministic lottery, no
    first-N-arrival bias). Per-source survivors reduce inside one
    groupby over (source)-keyed partials carrying only (doc_id, hash) —
    at 100 TB the hash ranking is a per-group top-K, never a global
    sort."""
    from ..stages.hashing import multiplicative_hash_u32
    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def partial(t: pa.Table) -> pa.Table:
        # top-K by hash is mergeable: each block pre-prunes to its own
        # per-source top-cap, so the groupby ships at most blocks*cap
        # rows per source — a hot source never lands whole in one task
        hv = multiplicative_hash_u32(
            t["doc_id"].to_numpy(zero_copy_only=False)).astype(np.int64)
        df = pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            "source": t["source"].to_numpy(zero_copy_only=False),
            "hv": hv})
        keep = (df.sort_values(["hv", "doc_id"])
                .groupby("source", sort=False).head(cap))
        return pa.Table.from_pandas(keep, preserve_index=False)

    def per_source(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["hv", "doc_id"]).head(cap)
                [["doc_id", "source"]])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("source").map_groups(per_source, batch_format="pandas")
           .to_pandas())
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def length_bucket_documents(sf_dir: str, buckets: int = 8) -> pd.DataFrame:
    """Sequence-length bucketing for batching efficiency (the padding
    killer in training loaders): equi-depth length buckets from the
    n_chars inverse CDF, then per-bucket doc count, max length, and the
    padding waste (pad-to-bucket-max overhead) in exact half-away ppm.
    The histogram rides one (n_chars -> count) groupby; bucket edges
    broadcast back into a map for the per-bucket sums."""
    ds = _t(sf_dir, "documents", ["doc_id", "n_chars"])

    hist = (ds.groupby("n_chars").aggregate(Count())
            .to_pandas().sort_values("n_chars"))
    vals = hist["n_chars"].to_numpy(np.int64)
    cnt = hist["count()"].to_numpy(np.int64)
    cum = cnt.cumsum()
    n = int(cum[-1])
    edges = [int(vals[np.searchsorted(cum, (i * n + buckets - 1)
                                      // buckets)])
             for i in range(1, buckets + 1)]  # inclusive upper edges
    edges_arr = np.asarray(edges, dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.searchsorted(edges_arr, nc, side="left").astype(np.int64)
        return (pa.table({"bucket": pa.array(b),
                          "n_chars": pa.array(nc)})
                .group_by("bucket")
                .aggregate([("n_chars", "sum"), ([], "count_all")])
                .rename_columns(["bucket", "chars", "n_docs"]))

    agg = (ds.map_batches(assign, batch_format="pyarrow")
           .groupby("bucket")
           .aggregate(Sum("chars", alias_name="chars"),
                      Sum("n_docs", alias_name="n_docs"))
           .to_pandas().sort_values("bucket"))
    rows = []
    for _, r in agg.iterrows():
        b = int(r["bucket"])
        hi = int(edges_arr[b])
        nd, ch = int(r["n_docs"]), int(r["chars"])
        padded = nd * hi
        waste = padded - ch
        waste_ppm = (2 * waste * 1_000_000 + padded) // (2 * padded)
        rows.append((b, hi, nd, int(waste_ppm)))
    out = pd.DataFrame(rows, columns=["bucket", "max_chars", "n_docs",
                                      "pad_waste_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def link_prediction_copurchase(sf_dir: str) -> pd.DataFrame:
    """Common-neighbors link prediction on the co-purchase graph: for
    every NON-adjacent part pair sharing >=1 neighbor, score = number
    of distinct shared neighbors; top-20 predicted links. Reuses
    `triangle_count_copurchase`'s distributed pair mining + support-2
    prune; the wedge join and the anti-join against existing edges run
    on the reduced edge frame (same documented output-invariant
    cutoff — at 100 TB both become hash joins keyed on the shared
    vertex)."""
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["l_orderkey"],
                                        pa.scalar(63, pa.int64())),
                        pa.int64())
        return (pa.table({"l_orderkey": t["l_orderkey"],
                          "l_partkey": t["l_partkey"], "_shard": shard})
                .group_by(["l_orderkey", "l_partkey", "_shard"])
                .aggregate([]))

    pairs, _ = _pairs_in_shards(
        ds.map_batches(sharded, batch_format="pyarrow"),
        ["l_orderkey"], "l_partkey")
    e = pairs[pairs["n"] >= 2].rename(
        columns={"l_partkey_a": "a", "l_partkey_b": "b"})[["a", "b"]]
    # undirected adjacency, wedges x-b-y with x<y, distinct middles
    und = pd.concat([e, e.rename(columns={"a": "b", "b": "a"})],
                    ignore_index=True)
    w = und.merge(und.rename(columns={"a": "b", "b": "c"}), on="b")
    w = w[w["a"] < w["c"]]
    cand = (w.drop_duplicates(["a", "b", "c"])
            .groupby(["a", "c"]).size().reset_index(name="score"))
    # anti-join: drop pairs that are already edges
    cand = cand.merge(e.rename(columns={"b": "c"}), on=["a", "c"],
                      how="left", indicator=True)
    cand = cand[cand["_merge"] == "left_only"].drop(columns="_merge")
    out = cand.sort_values(["score", "a", "c"],
                           ascending=[False, True, True]).head(20)
    out = out.rename(columns={"a": "part_a", "c": "part_b"})
    for c in ("part_a", "part_b", "score"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def t_closeness_audit_events(sf_dir: str, t_ppm: int = 200_000
                             ) -> pd.DataFrame:
    """T-closeness audit — the third leg of the privacy triple after
    `k_anonymity_audit_events` and `l_diversity_audit_events`: a class
    can be k-anonymous AND l-diverse yet still leak when its sensitive
    distribution deviates from the global one. Categorical sensitive
    attribute -> the distance is total variation
    0.5 * sum_i |P_i - Q_i|, computed as EXACT integers
    (|n_ci*N - N_i*n_c| folded over the domain-bounded
    (class x sensitive) frame) and rounded half-away to ppm. Same QI
    classes and SQL-mirrorable user-bucket hash as the k/l audits."""
    from ..stages.hashing import multiplicative_hash_u32
    ds = _t(sf_dir, "events", ["user_id", "event_type", "ts"])

    _schema = pa.schema([("b", pa.int64()), ("h", pa.int64()),
                         ("dow", pa.int64()), ("event_type", pa.string()),
                         ("nc", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        tus = np.asarray(column_ts_us(t["ts"]))
        h = (tus // HOUR_US) % 24
        dow = (tus // DAY_US + 4) % 7
        b = (multiplicative_hash_u32(
            t["user_id"].to_numpy(zero_copy_only=False))
            % np.uint64(32)).astype(np.int64)
        return (pa.table({"b": pa.array(b), "h": pa.array(h),
                          "dow": pa.array(dow),
                          "event_type": t["event_type"]})
                .group_by(["b", "h", "dow", "event_type"])
                .aggregate([([], "count_all")])
                .rename_columns(["b", "h", "dow", "event_type", "nc"])
                .cast(_schema))

    cc = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["b", "h", "dow", "event_type"])
          .aggregate(Sum("nc", alias_name="nc")).to_pandas())
    glob = cc.groupby("event_type")["nc"].sum()  # N_i
    nn = int(glob.sum())                         # N
    # dense (class x sensitive) grid including zero cells
    grid = cc.pivot_table(index=["b", "h", "dow"], columns="event_type",
                          values="nc", aggfunc="sum", fill_value=0)
    grid = grid.reindex(columns=glob.index, fill_value=0)
    n_c = grid.sum(axis=1).to_numpy(np.int64)
    num = np.zeros(len(grid), dtype=object)
    for j, et in enumerate(glob.index):
        num += np.abs(grid[et].to_numpy(np.int64).astype(object) * nn
                      - int(glob[et]) * n_c.astype(object))
    den = 2 * n_c.astype(object) * nn
    tvd_ppm = np.array([(2 * a * 1_000_000 + d) // (2 * d)
                        for a, d in zip(num, den)], dtype=np.int64)
    return pd.DataFrame({
        "n_classes": np.array([len(tvd_ppm)], np.int64),
        "max_tvd_ppm": np.array([int(tvd_ppm.max())], np.int64),
        "n_above_t": np.array([int((tvd_ppm > t_ppm).sum())], np.int64)})


def zipf_slope_sources(sf_dir: str) -> pd.DataFrame:
    """Zipf law fit per source: OLS slope of ln(freq) on ln(rank) over
    each source's top-100 terms (rank ties broken by term asc, exactly
    the SQL window's order). The corpus-statistics health check a
    webtext pipeline trends — a slope far from ~-1 flags boilerplate
    or spam-generated sources. Term counts pre-aggregate per block, so
    the shuffle carries (source, term) partials, never token rows."""
    ds = _t(sf_dir, "documents", ["source", "text"])

    _schema = pa.schema([("source", pa.string()), ("term", pa.string()),
                         ("c", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        words = pc.split_pattern(t["text"], " ").combine_chunks()
        n_tok = pc.list_value_length(words).to_numpy().astype(np.int64)
        src = np.repeat(
            np.asarray(t["source"].to_numpy(zero_copy_only=False)), n_tok)
        flat = words.flatten()
        tt = pa.table({"source": pa.array(src), "term": flat})
        tt = tt.filter(pc.not_equal(tt["term"], ""))
        return (tt.group_by(["source", "term"])
                .aggregate([([], "count_all")])
                .rename_columns(["source", "term", "c"]).cast(_schema))

    def slope_per_source(df: pd.DataFrame) -> pd.DataFrame:
        # runs inside the source's reduce task: the driver never sees
        # the vocab-sized count frame, only one slope row per source
        sub = df.sort_values(["c", "term"],
                             ascending=[False, True]).head(100)
        n = len(sub)
        x = np.log(np.arange(1, n + 1, dtype=np.float64))
        y = np.log(sub["c"].to_numpy(np.float64))
        sx, sy = x.sum(), y.sum()
        slope = (n * (x * y).sum() - sx * sy) / (n * (x * x).sum()
                                                 - sx * sx)
        return pd.DataFrame({"source": [df["source"].iloc[0]],
                             "n_terms": np.array([n], np.int64),
                             "zipf_slope_6": [np.round(slope, 6)]})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["source", "term"]).aggregate(Sum("c", alias_name="c"))
           .groupby("source")
           .map_groups(slope_per_source, batch_format="pandas")
           .to_pandas())
    out["n_terms"] = out["n_terms"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def mean_excess_events(sf_dir: str) -> pd.DataFrame:
    """Peaks-over-threshold tail statistic per type (extreme-value
    analysis): threshold u = that type's p90 (inverted-CDF lower value,
    quantile_disc convention), exceedance count, and the mean excess
    E[X-u | X>u] in exact half-away micro units — all read from the
    same distinct-value cents histogram as the other robust stats, so
    the shuffle carries (type, cents) pairs, never rows."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    _schema = pa.schema([("event_type", pa.string()),
                         ("cents", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        cents = np.round(t["value"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        return (pa.table({"event_type": t["event_type"],
                          "cents": pa.array(cents)})
                .group_by(["event_type", "cents"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "cents", "n"])
                .cast(_schema))

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    rows = []
    for etype, sub in hist.groupby("event_type"):
        sub = sub.sort_values("cents")
        vals = sub["cents"].to_numpy(np.int64)
        cnt = sub["n"].to_numpy(np.int64)
        cum = cnt.cumsum()
        n = int(cum[-1])
        u = int(vals[np.searchsorted(cum, (90 * n + 99) // 100)])
        over = vals > u
        n_exc = int(cnt[over].sum())
        s_exc = int(((vals[over] - u).astype(object)
                     * cnt[over].astype(object)).sum())
        rows.append((etype, u, n_exc,
                     int(_ppm(np.array([s_exc], object),
                              np.array([n_exc * 100], object))[0])))
    out = pd.DataFrame(rows, columns=["event_type", "u_cents",
                                      "n_exceed", "mean_excess_micro"])
    for c in ("u_cents", "n_exceed", "mean_excess_micro"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def trimmed_mean_events(sf_dir: str) -> pd.DataFrame:
    """Two-sided 10% trimmed mean per type — the robust-location stat
    between median and mean: drop the n//10 smallest and largest
    observations, average the rest, exact half-away micro units. Reads
    the same distinct-value cents histogram as the other robust stats
    (the shuffle carries (type, cents) pairs, never rows); the boundary
    value's count is PARTIALLY included via cumulative clipping, so the
    result is exactly the row-level definition."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    _schema = pa.schema([("event_type", pa.string()),
                         ("cents", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        cents = np.round(t["value"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        return (pa.table({"event_type": t["event_type"],
                          "cents": pa.array(cents)})
                .group_by(["event_type", "cents"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "cents", "n"])
                .cast(_schema))

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    rows = []
    for etype, sub in hist.groupby("event_type"):
        sub = sub.sort_values("cents")
        vals = sub["cents"].to_numpy(np.int64).astype(object)
        cnt = sub["n"].to_numpy(np.int64)
        cum = cnt.cumsum()
        n = int(cum[-1])
        k = n // 10
        take = (np.minimum(cum, n - k)
                - np.maximum(cum - cnt, k)).clip(min=0)
        s = int((vals * take.astype(object)).sum())
        kept = n - 2 * k
        rows.append((etype, n, kept,
                     int(_ppm(np.array([s], object),
                              np.array([kept * 100], object))[0])))
    out = pd.DataFrame(rows, columns=["event_type", "n", "n_kept",
                                      "trimmed_mean_micro"])
    for c in ("n", "n_kept", "trimmed_mean_micro"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def tdigest_percentiles_events(sf_dir: str) -> pd.DataFrame:
    """Per-type value percentiles via mergeable t-digest
    (`stages/sketches.py::tdigest_quantiles`) — the unbounded-domain
    companion to the fixed-range histogram sketch: no min/max pre-pass,
    relative tail accuracy ~1/delta, constant-size centroid partials
    riding one groupby. Approximate by construction -> rows-only;
    accuracy pinned vs exact quantiles in tests/test_sketches.py."""
    from ..stages.sketches import tdigest_quantiles

    ds = _t(sf_dir, "events", ["event_type", "value"])
    return tdigest_quantiles(ds, "event_type", "value",
                             quantiles=(0.5, 0.9, 0.99), delta=200)


def decayed_type_scores(sf_dir: str) -> pd.DataFrame:
    """Half-life-decayed leaderboard (the streaming 'trending' score):
    each event contributes 2^(40 - age_days) — a one-day half-life
    expressed in exact dyadic integers, so the distributed sum is
    EXACT int64 arithmetic with no float decay drift (ages > 40 days
    contribute 0). Two passes: a max-ts reduce, then per-block
    (type, score) partials into a 5-row groupby."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])
    hi_day = int(ds.map_batches(
        lambda t: pa.table({"m": pa.array(
            [int(np.asarray(column_ts_us(t["ts"])).max())], pa.int64())}),
        batch_format="pyarrow").to_pandas()["m"].max()) // DAY_US

    def partial(t: pa.Table) -> pa.Table:
        age = (hi_day - np.asarray(column_ts_us(t["ts"])) // DAY_US
               ).astype(np.int64)
        # clip BEFORE shifting: np.where evaluates both branches, and a
        # negative shift (age > 40) is UB even in the masked branch
        wt = np.where(age <= 40,
                      np.int64(1) << np.clip(40 - age, 0, 40),
                      np.int64(0))
        tt = pa.table({"event_type": t["event_type"],
                       "score": pa.array(wt, pa.int64())})
        return (tt.group_by("event_type").aggregate([("score", "sum")])
                .rename_columns(["event_type", "score"]))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type").aggregate(Sum("score", alias_name="score"))
           .to_pandas())
    out["score"] = out["score"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def logreg_purchase_events(sf_dir: str) -> pd.DataFrame:
    """Distributed full-batch logistic regression: predict
    event_type == 'purchase' from [1, z(value), sin(hour), cos(hour)].

    Iterative map+reduce in the kmeans shape (`stages/cluster.py`):
    materialize the pruned projection once, broadcast the weight vector
    each iteration (`ray.put`), and emit ONE gradient partial row per
    block. Per-row gradients quantize to nano-units (int64) BEFORE the
    block sum, so the fold is exact integer arithmetic — training is
    bit-identical across block layouts and cluster sizes (same recipe
    as the integer-scaled kmeans partials). 25 fixed GD steps, lr=2.0.
    At 100 TB the same loop runs on minibatch hash-samples per step;
    the partial shape (4 ints per block per step) is already the
    scale-correct exchange."""
    iters, lr, nano = 25, 2.0, 1_000_000_000

    ds = _t(sf_dir, "events", ["event_type", "value", "ts"])

    # global value moments from exact integer cents partials (one pass)
    def moments(t: pa.Table) -> pa.Table:
        c = np.round(np.asarray(t["value"].to_numpy(zero_copy_only=False),
                                dtype=np.float64) * 100).astype(np.int64)
        return pa.table({"n": pa.array([len(c)], pa.int64()),
                         "s": pa.array([int(c.sum())], pa.int64()),
                         "ss": pa.array([int((c * c).sum())], pa.int64())})

    m = ds.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    n_total = int(m["n"])
    mean_c = m["s"] / n_total
    std_c = float(np.sqrt(m["ss"] / n_total - mean_c ** 2)) or 1.0

    ds = ds.materialize()  # iterative: pay the read once

    def feats(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        cents = np.round(np.asarray(
            t["value"].to_numpy(zero_copy_only=False),
            dtype=np.float64) * 100)
        h = ((np.asarray(column_ts_us(t["ts"])) // HOUR_US) % 24
             ).astype(np.float64)
        x = np.column_stack([
            np.ones(len(t)),
            (cents - mean_c) / std_c,
            np.sin(2 * np.pi * h / 24.0),
            np.cos(2 * np.pi * h / 24.0),
        ])
        y = (np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
             == "purchase").astype(np.float64)
        return x, y

    def grad_partial(t: pa.Table, *, w_ref) -> pa.Table:
        w = broadcast_get(w_ref)
        x, y = feats(t)
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        # quantize per ROW (layout-invariant), then exact int64 sums
        g = np.round((p - y)[:, None] * x * nano).astype(np.int64)
        return pa.table({"g": pa.array([g.sum(axis=0).tolist()],
                                       pa.list_(pa.int64()))})

    w = np.zeros(4, dtype=np.float64)
    for _ in range(iters):
        ref = ray.put(w)
        parts = ds.map_batches(grad_partial, fn_kwargs={"w_ref": ref},
                               batch_format="pyarrow").to_pandas()
        g = np.sum([np.asarray(v, dtype=np.int64) for v in parts["g"]],
                   axis=0)
        w = w - lr * (g / nano) / n_total

    def score_partial(t: pa.Table, *, w_ref) -> pa.Table:
        wv = broadcast_get(w_ref)
        x, y = feats(t)
        pred = (x @ wv) > 0.0
        return pa.table({
            "correct": pa.array([int((pred == (y > 0.5)).sum())],
                                pa.int64()),
            "n": pa.array([len(t)], pa.int64())})

    ref = ray.put(w)
    sc = ds.map_batches(score_partial, fn_kwargs={"w_ref": ref},
                        batch_format="pyarrow").to_pandas().sum()
    rows = [("w_bias", int(np.round(w[0] * nano))),
            ("w_value", int(np.round(w[1] * nano))),
            ("w_sin_hour", int(np.round(w[2] * nano))),
            ("w_cos_hour", int(np.round(w[3] * nano))),
            ("n_correct", int(sc["correct"])),
            ("n_total", int(sc["n"]))]
    return pd.DataFrame({"metric": [r[0] for r in rows],
                         "value": np.array([r[1] for r in rows],
                                           dtype=np.int64)})


def streaming_corrections(sf_dir: str) -> pd.DataFrame:
    """Allowed-lateness UPDATE mode showcase (rows-only): the flagship
    pipeline with ``update_mode`` on a pages log carrying a heavy
    very-late tail. Rows within the horizon behind the frozen watermark
    are accepted as corrections; already-emitted windows re-emit in the
    ``window_updates`` output with a bumped revision (Flink-style window
    revisions — consumers take max revision per (kind, key, start))."""
    import shutil

    from ..config import EngineConfig
    from ..pipelines.flagship import ensure_pages_log, run_flagship
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink
    from ..sources.pages import PagesSpec

    tier = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    rows = 6000 if tier.endswith("0.01") else 2000
    data_dir = f"/tmp/bitquery_kafka_streams_rust_ray_pages_late_{tier}_{rows}"
    ensure_pages_log(data_dir,
                     PagesSpec(num_rows=rows, very_late_frac=0.05, seed=7))
    out_dir = f"{data_dir}_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = EngineConfig(min_text_len=1, state_shards=8, extract_concurrency=4,
                       update_mode=True, update_horizon_s=60)
    run_flagship(data_dir, out_dir, config=cfg, resume=False)
    res = read_output_compacted(EpochSink(out_dir),
                                "window_updates").to_pandas()
    return res.sort_values(["kind", "key", "window_start", "revision"]
                           ).reset_index(drop=True)


def streaming_interval_join(sf_dir: str) -> pd.DataFrame:
    """Streaming dual-buffer interval self-join showcase (rows-only):
    the flagship with ``interval_join_s=60`` emits every pair of
    surviving pages from the same host within 60 s of each other
    (co-crawl bursts) into ``copage_pairs`` — exactly once, at the
    later row's arrival epoch, with watermark-evicted per-host buffers
    (the stateful streaming form of the batch interval join). The
    entry SELF-CHECKS the emitted pair set against a DuckDB self-join
    over the committed surviving pages."""
    import shutil

    import duckdb

    from ..config import EngineConfig
    from ..pipelines.flagship import ensure_pages_log, run_flagship
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink
    from ..sources.pages import PagesSpec

    tier = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    rows = 6000 if tier.endswith("0.01") else 2000
    data_dir = f"/tmp/bitquery_kafka_streams_rust_ray_pages_{tier}_{rows}"
    ensure_pages_log(data_dir, PagesSpec(num_rows=rows))
    out_dir = f"{data_dir}_iv_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = EngineConfig(min_text_len=1, state_shards=8, extract_concurrency=4,
                       interval_join_s=60)
    run_flagship(data_dir, out_dir, config=cfg, resume=False)
    sink = EpochSink(out_dir)
    got = read_output_compacted(sink, "copage_pairs").to_pandas()
    if not len(got):
        raise AssertionError("interval join emitted no pairs")
    pages = read_output_compacted(sink, "pages").to_pandas()
    con = duckdb.connect()
    con.register("pages", pages[["host", "url", "warc_ts"]])
    want = con.execute("""
        SELECT a.host, a.url AS url_a, a.warc_ts AS ts_a,
               b.url AS url_b, b.warc_ts AS ts_b
        FROM pages a JOIN pages b
          ON a.host = b.host AND a.host <> ''
         AND (a.warc_ts, a.url) < (b.warc_ts, b.url)
         AND epoch_us(b.warc_ts) - epoch_us(a.warc_ts)
             <= 60000000::BIGINT
    """).df()
    key = ["host", "url_a", "ts_a", "url_b", "ts_b"]
    for df in (got, want):
        df["ts_a"] = df["ts_a"].astype("datetime64[us]")
        df["ts_b"] = df["ts_b"].astype("datetime64[us]")
    g = got[key].sort_values(key).reset_index(drop=True)
    w = want[key].sort_values(key).reset_index(drop=True)
    if not g.equals(w):
        raise AssertionError(
            f"pair set diverged from the batch self-join "
            f"({len(g)} vs {len(w)} rows)")
    return g


def streaming_savepoint_fork(sf_dir: str) -> pd.DataFrame:
    """Savepoint showcase (rows-only): export epoch 1's committed
    checkpoint from a finished reference run, bootstrap a FRESH output
    dir from it (``state/savepoint.py``), and resume — forking the
    processing without the history. The entry SELF-CHECKS byte-equality
    of every post-savepoint epoch file between fork and original, then
    returns the fork's committed tumbling windows."""
    import hashlib
    import shutil

    from ..config import EngineConfig
    from ..pipelines.flagship import ensure_pages_log, run_flagship
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink
    from ..sources.pages import PagesSpec
    from ..state.savepoint import export_savepoint, fork_from_savepoint

    tier = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    rows = 6000 if tier.endswith("0.01") else 2000
    data_dir = f"/tmp/bitquery_kafka_streams_rust_ray_pages_{tier}_{rows}"
    ensure_pages_log(data_dir, PagesSpec(num_rows=rows))
    cfg = EngineConfig(min_text_len=1, state_shards=4,
                       extract_concurrency=4, files_per_epoch=2)

    ref_out = f"{data_dir}_sp_ref"
    shutil.rmtree(ref_out, ignore_errors=True)
    run_flagship(data_dir, ref_out, config=cfg, resume=False)
    sp = f"{data_dir}_sp"
    export_savepoint(ref_out, sp, epoch=1)
    fork_out = f"{data_dir}_sp_fork"
    shutil.rmtree(fork_out, ignore_errors=True)
    fork_from_savepoint(sp, fork_out)
    run_flagship(data_dir, fork_out, config=cfg, resume=True)

    def hashes(out):
        sink = EpochSink(out)
        h = {}
        for e in sink.committed_epochs():
            if e <= 1:
                continue
            d = sink.epoch_dir(e)
            for f in sorted(os.listdir(d)):
                with open(os.path.join(d, f), "rb") as fh:
                    h[f"{e}/{f}"] = hashlib.sha256(fh.read()).hexdigest()
        return h

    if hashes(fork_out) != hashes(ref_out):
        raise AssertionError("forked epochs diverged from the original")
    return (read_output_compacted(EpochSink(fork_out), "tumbling_lang")
            .to_pandas()
            .sort_values(["key", "window_start"]).reset_index(drop=True))


def session_corrections(sf_dir: str) -> pd.DataFrame:
    """Session retract/add changelog showcase (rows-only): under update
    mode an accepted-late row that lands within ``gap`` of an
    already-emitted session REOPENS it — the corrected emission retracts
    the exact prior row(s) (one late event can MERGE two emitted
    sessions) and adds the new one. A changelog rather than in-place
    revisions because merges change the row identity (start/end). The
    entry SELF-CHECKS the contract: every retract matches a live row
    (base emission or earlier add) and the patched consumer view
    (``read_sessions_corrected``) equals base - retracts + live adds."""
    import shutil

    from ..config import EngineConfig
    from ..pipelines.flagship import (ensure_pages_log,
                                      read_sessions_corrected, run_flagship)
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink
    from ..sources.pages import PagesSpec

    tier = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    rows = 6000 if tier.endswith("0.01") else 2000
    data_dir = f"/tmp/bitquery_kafka_streams_rust_ray_pages_slate_{tier}_{rows}"
    ensure_pages_log(data_dir,
                     PagesSpec(num_rows=rows, very_late_frac=0.05, seed=11))
    out_dir = f"{data_dir}_sess_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    # horizon == session gap (180 s): the reopen band is empty when the
    # horizon is much smaller than the gap (an accepted-late row would
    # land > gap behind any emitted session's last event)
    cfg = EngineConfig(min_text_len=1, state_shards=8, extract_concurrency=4,
                       update_mode=True, update_horizon_s=180)
    run_flagship(data_dir, out_dir, config=cfg, resume=False)
    sink = EpochSink(out_dir)
    upd = read_output_compacted(sink, "session_updates").to_pandas()
    if not len(upd):
        raise AssertionError("fixture produced no session corrections")
    base = read_output_compacted(sink, "session_host").to_pandas()
    key_cols = ["host", "session_start", "session_end"]
    live = set(map(tuple, base[key_cols].itertuples(index=False)))
    n_adds = 0
    for r in upd.itertuples():  # epoch-ordered changelog replay
        k = (r.host, r.session_start, r.session_end)
        if r.action == "retract":
            if k not in live:
                raise AssertionError(f"retract of a row never live: {k}")
            live.discard(k)
        else:
            live.add(k)
            n_adds += 1
    view = read_sessions_corrected(out_dir)
    got = set(map(tuple, view[key_cols].itertuples(index=False)))
    if got != live:
        raise AssertionError("corrected view != changelog replay")
    return upd.sort_values(key_cols + ["action", "revision"]
                           ).reset_index(drop=True)


def streaming_early_fire(sf_dir: str) -> pd.DataFrame:
    """Early-firing showcase (rows-only): the flagship with
    ``early_fire`` emits speculative previews of still-open windows at
    every epoch commit (``window_early`` output, tagged with the
    emitting epoch). Previews are monotone per window and superseded by
    the final on-time emission — with update_mode this completes the
    Flink trigger triple (early / on-time / late correction)."""
    import shutil

    from ..config import EngineConfig
    from ..pipelines.flagship import ensure_pages_log, run_flagship
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink
    from ..sources.pages import PagesSpec

    tier = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    rows = 6000 if tier.endswith("0.01") else 2000
    data_dir = f"/tmp/bitquery_kafka_streams_rust_ray_pages_{tier}_{rows}"
    ensure_pages_log(data_dir, PagesSpec(num_rows=rows))
    out_dir = f"{data_dir}_early_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = EngineConfig(min_text_len=1, state_shards=8, extract_concurrency=4,
                       early_fire=True)
    run_flagship(data_dir, out_dir, config=cfg, resume=False)
    res = read_output_compacted(EpochSink(out_dir),
                                "window_early").to_pandas()
    return res.sort_values(["epoch", "kind", "key", "window_start"]
                           ).reset_index(drop=True)


def streaming_rescale(sf_dir: str) -> pd.DataFrame:
    """Cluster-resize showcase (rows-only): a run checkpointed with 4
    state shards is resumed mid-stream with 8 — ``state/rescale.py``
    repartitions every keyed state family by the stable key hash. The
    entry SELF-CHECKS the contract before returning: the rescaled run's
    tumbling windows must be byte-equal to an uninterrupted 4-shard
    reference (only the per-shard page-file layout may move)."""
    import dataclasses
    import shutil

    from ..config import EngineConfig
    from ..pipelines.flagship import ensure_pages_log, run_flagship
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink
    from ..sources.pages import PagesSpec

    tier = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    rows = 6000 if tier.endswith("0.01") else 2000
    data_dir = f"/tmp/bitquery_kafka_streams_rust_ray_pages_{tier}_{rows}"
    ensure_pages_log(data_dir, PagesSpec(num_rows=rows))
    cfg4 = EngineConfig(min_text_len=1, state_shards=4,
                        extract_concurrency=4, files_per_epoch=2)

    ref_out = f"{data_dir}_rescale_ref"
    shutil.rmtree(ref_out, ignore_errors=True)
    run_flagship(data_dir, ref_out, config=cfg4, resume=False)

    out = f"{data_dir}_rescale_out"
    shutil.rmtree(out, ignore_errors=True)
    run_flagship(data_dir, out, config=cfg4, resume=False)
    sink = EpochSink(out)
    for e in sink.committed_epochs()[-2:]:  # force a mid-stream resume
        os.remove(sink.manifest_path(e))
    cfg8 = dataclasses.replace(cfg4, state_shards=8)
    summary = run_flagship(data_dir, out, config=cfg8, resume=True)
    if summary["metrics"]["counters"].get("state_rescales") != 1:
        raise AssertionError("rescaled resume did not trigger")

    def windows(o):
        return (read_output_compacted(EpochSink(o), "tumbling_lang")
                .to_pandas()
                .sort_values(["key", "window_start"])
                .reset_index(drop=True))

    got, want = windows(out), windows(ref_out)
    if not got.equals(want):
        raise AssertionError("rescaled windows diverged from the "
                             "uninterrupted reference")
    return got


def streaming_idle_watermark(sf_dir: str) -> pd.DataFrame:
    """Idle-partition exclusion showcase (rows-only): on a pages log
    whose key-shard stream 3 dies after slice 1, plain min-combine pins
    every later epoch's committed watermark at the dead shard's frozen
    max; ``watermark_idle_epochs=2`` excludes it after two silent
    epochs and the watermark advances with the live streams. Returns
    the per-epoch committed watermark under both modes (the off column
    goes flat where the on column keeps rising — and both runs' window
    outputs stay governed by their own deterministic schedule)."""
    import glob as _glob
    import shutil

    from ..config import EngineConfig
    from ..pipelines.flagship import run_flagship
    from ..sinks.exactly_once import EpochSink
    from ..sources.pages import (PagesSpec, generate_host_metadata,
                                 generate_pages)

    tier = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    rows = 6000 if tier.endswith("0.01") else 3000
    data_dir = f"/tmp/bitquery_kafka_streams_rust_ray_deadshard_{tier}_{rows}"
    if not os.path.exists(os.path.join(data_dir, ".complete")):
        shutil.rmtree(data_dir, ignore_errors=True)
        spec = PagesSpec(num_rows=rows, num_slices=6, shards=4, seed=13)
        generate_pages(data_dir, spec)
        generate_host_metadata(data_dir, spec)
        for f in _glob.glob(os.path.join(data_dir, "pages-*-03.parquet")):
            if int(os.path.basename(f).split("-")[1]) >= 2:
                os.remove(f)
        with open(os.path.join(data_dir, ".complete"), "w") as fh:
            fh.write("ok")
    base = EngineConfig(min_text_len=1, state_shards=4,
                        extract_concurrency=4, files_per_epoch=1,
                        per_partition_watermark=True)
    import dataclasses
    wms = {}
    for name, cfg in (("watermark_pinned_us", base),
                      ("watermark_idle_excluded_us",
                       dataclasses.replace(base, watermark_idle_epochs=2))):
        out = f"{data_dir}_{name}_out"
        shutil.rmtree(out, ignore_errors=True)
        run_flagship(data_dir, out, config=cfg, resume=False)
        sink = EpochSink(out)
        wms[name] = [sink.read_manifest(e)["watermark_us"]
                     for e in sink.committed_epochs()]
    return pd.DataFrame({"epoch": range(len(wms["watermark_pinned_us"])),
                         **wms})


# --- streaming final views with exact SQL oracles -----------------------
# The rows-only streaming showcases prove the *mechanics* (revisions,
# previews, changelogs, buffer eviction); these four drive the SAME full
# engine over the events testdata re-shaped as a pages log
# (sources/events_log.py) so the drained final state has an exact DuckDB
# twin over the pre-registered ``events`` view — hash-checked end-state
# correctness for update-mode corrections, early firing, session windows
# and the streaming interval join.


def _events_stream_run(sf_dir: str, tag: str, cfg, **log_kw) -> str:
    import shutil as _shutil

    from ..pipelines.flagship import run_flagship
    from ..sources.events_log import events_pages_log

    data_dir = events_pages_log(sf_dir, tag, **log_kw)
    out_dir = f"{data_dir}_out"
    _shutil.rmtree(out_dir, ignore_errors=True)
    run_flagship(data_dir, out_dir, config=cfg, resume=False)
    return out_dir


def _events_window_cfg(**over):
    from ..config import EngineConfig, WindowConfig

    kw = dict(min_text_len=1, state_shards=8, extract_concurrency=4,
              windows=WindowConfig(tumbling_size_s=3600,
                                   sliding_size_s=7200,
                                   sliding_slide_s=3600,
                                   session_gap_s=21600))
    kw.update(over)
    return EngineConfig(**kw)


def _win_us(df: pd.DataFrame, cols=("window_start", "window_end")):
    for c in cols:
        df[c] = df[c].astype("datetime64[us]")
    return df


def streaming_corrections_final(sf_dir: str) -> pd.DataFrame:
    """Update-mode corrections, oracle-checked end state: ~2% of events
    arrive five days late (behind the frozen watermark), are accepted
    inside the update horizon, and re-emit their already-closed hourly
    windows with bumped revisions. The consumer max-revision view after
    the drain must equal the plain batch aggregate over ALL events —
    the SQL twin. The entry also asserts the corrections path actually
    fired (>=1 committed revision)."""
    from ..pipelines.flagship import read_windows_corrected
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink

    # dedup_window must cover the horizon so accepted-late rows still
    # dedup against their twins (config invariant); urls are unique
    # here, so the wider retention only sizes the (10k-key) dedup map
    cfg = _events_window_cfg(update_mode=True,
                             update_horizon_s=40 * 86400,
                             dedup_window_s=40 * 86400)
    out_dir = _events_stream_run(sf_dir, "corrfinal", cfg,
                                 late_mod=50, late_delay_s=5 * 86400)
    upd = read_output_compacted(EpochSink(out_dir),
                                "window_updates").to_pandas()
    if not len(upd):
        raise AssertionError("update mode emitted no corrections")
    res = read_windows_corrected(out_dir)
    res = _win_us(res[["key", "window_start", "window_end",
                       "doc_count", "total_chars"]].copy())
    return res.sort_values(["key", "window_start"]).reset_index(drop=True)


def streaming_early_fire_final(sf_dir: str) -> pd.DataFrame:
    """Early-firing, oracle-checked end state: per-epoch speculative
    previews of still-open hourly windows are committed alongside the
    stream; the final closed windows after the drain must equal the
    batch aggregate (previews are a pure view and never double-count).
    Asserts previews were actually emitted."""
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink

    cfg = _events_window_cfg(early_fire=True)
    out_dir = _events_stream_run(sf_dir, "earlyfinal", cfg)
    sink = EpochSink(out_dir)
    early = read_output_compacted(sink, "window_early").to_pandas()
    if not len(early):
        raise AssertionError("early firing emitted no previews")
    res = read_output_compacted(sink, "tumbling_lang").to_pandas()
    res = _win_us(res)
    return res.sort_values(["key", "window_start"]).reset_index(drop=True)


def streaming_sessions_final(sf_dir: str) -> pd.DataFrame:
    """Session windows, oracle-checked end state: per-user sessions with
    a 6 h gap over the event stream; the drained ``session_host`` output
    must equal the gaps-and-islands SQL over events (session_end is
    ``last + gap``, a break is ``ts - prev > gap`` strictly)."""
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink

    out_dir = _events_stream_run(sf_dir, "sessfinal", _events_window_cfg())
    res = read_output_compacted(EpochSink(out_dir),
                                "session_host").to_pandas()
    res = _win_us(res, cols=("session_start", "session_end"))
    return (res.sort_values(["host", "session_start"])
            .reset_index(drop=True))


def streaming_interval_join_final(sf_dir: str) -> pd.DataFrame:
    """Streaming interval self-join, oracle-checked end state: co-visit
    pairs per user within 4 h, emitted exactly once from the dual-buffer
    state with watermark eviction; the drained pair set must equal the
    batch SQL self-join over events."""
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink

    cfg = _events_window_cfg(interval_join_s=14400)
    out_dir = _events_stream_run(sf_dir, "ivlfinal", cfg)
    res = read_output_compacted(EpochSink(out_dir),
                                "copage_pairs").to_pandas()
    if not len(res):
        raise AssertionError("interval join emitted no pairs")
    res = _win_us(res, cols=("ts_a", "ts_b"))
    key = ["host", "url_a", "ts_a", "url_b", "ts_b"]
    return res[key].sort_values(key).reset_index(drop=True)


def multimodal_frames(sf_dir: str) -> pd.DataFrame:
    """Video frame-sample plumbing (rows-only): each fake video row
    flat-maps into frame rows whose payloads feed the image decoder —
    the compose-the-stages path a real frame-dedup pipeline takes.
    Keys derive from nation rows so the driver fixture is tiny."""
    from ..stages.multimodal import (DecodeImageStage, FrameSampleStage,
                                     fake_video)

    keys = _t(sf_dir, "nation", ["n_nationkey"]).to_pandas()[
        "n_nationkey"].tolist()
    rows = [
        {"vid_id": int(k),
         "video": fake_video(8 + k % 4, 6 + k % 3, n_frames=12 + k % 9,
                             seed=int(k))}
        for k in keys
    ]
    frames = rd.from_items(rows).map_batches(
        FrameSampleStage, fn_constructor_kwargs={"every": 5},
        batch_format="pyarrow", batch_size=32, concurrency=(1, 2),
    )
    out = frames.map_batches(
        DecodeImageStage, fn_constructor_kwargs={"image_col": "frame"},
        batch_format="pyarrow", batch_size=32, concurrency=(1, 2),
    ).to_pandas()
    return (out.sort_values(["vid_id", "frame_idx"])
            .reset_index(drop=True))


def multimodal_audio(sf_dir: str) -> pd.DataFrame:
    """Audio feature-extract plumbing (rows-only): alternating REAL
    PCM WAV (stdlib wave wire format) and deterministic fake
    containers -> (sample_rate, n_samples, duration_s, rms)."""
    from ..stages.multimodal import AudioFeatureStage, encode_wav, fake_audio

    keys = _t(sf_dir, "region", ["r_regionkey"]).to_pandas()[
        "r_regionkey"].tolist()

    def payload(k: int) -> bytes:
        sr, n = 8000 + 100 * (k % 5), 4000 + 321 * k
        if k % 2 == 0:  # real WAV wire format
            rng = np.random.default_rng(k)
            return encode_wav(
                sr, (rng.standard_normal(n) * 1000).astype(np.int16))
        return fake_audio(sr, n, seed=k)

    rows = [{"aud_id": int(k), "audio": payload(int(k))} for k in keys]
    out = rd.from_items(rows).map_batches(
        AudioFeatureStage, fn_constructor_kwargs={"audio_col": "audio"},
        batch_format="pyarrow", batch_size=16, concurrency=(1, 2),
    ).to_pandas()
    return out.sort_values("aud_id").reset_index(drop=True)


def multimodal_decode(sf_dir: str) -> pd.DataFrame:
    """Image-decode plumbing over a mixed corpus cycling FOUR wire
    formats — REAL PNG (zlib + scanline filters), REAL GIF89a (pure
    LZW), REAL uncompressed BMP (struct), and the deterministic fake
    container — all decoding through the same sniffing stage with
    format-independent checksums (rows-only; only codecs needing
    PIL/ffmpeg remain stubs)."""
    from ..stages.multimodal import (DecodeImageStage, encode_bmp,
                                     encode_gif, encode_png, fake_image)

    keys = _t(sf_dir, "part", ["p_partkey"]).to_pandas()["p_partkey"].tolist()

    def payload(k: int) -> bytes:
        w, h = 8 + k % 8, 8 + k % 5
        m = k % 4
        if m == 3:
            return fake_image(w, h, seed=k)
        rng = np.random.default_rng(k)
        gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        return (encode_png, encode_gif, encode_bmp)[m](gray)

    rows = [{"img_id": int(k), "image": payload(int(k))} for k in keys]
    ds = rd.from_items(rows)
    out = ds.map_batches(
        DecodeImageStage, fn_constructor_kwargs={"image_col": "image"},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 2),
    ).to_pandas()
    return out.sort_values("img_id").reset_index(drop=True)


# --- round-3 additions: LM scoring, window funcs, outer join, PQ --------


def bigram_lm_documents(sf_dir: str,
                        broadcast_threshold_bytes: int = 1 << 28
                        ) -> pd.DataFrame:
    """CCNet/DSIR-style language-model quality scoring: every document
    scored by the mean log-probability of its word bigrams under an
    add-one-smoothed bigram LM trained on the corpus itself (the
    perplexity-filter family — Wenzek et al., CCNet; public method).

    Scale shape: one tokenize pass emits complete per-doc bigram
    term-frequency rows (a doc is one input row, so its tf is
    batch-local); corpus bigram counts and prefix counts are
    distributed ``groupby`` reductions that stay Datasets; both ride
    BACK onto the per-doc rows via a size-adaptive join — broadcast
    dicts when the counted distinct-bigram frame is small, partitioned
    hash joins otherwise (a web-scale bigram vocabulary fits no single
    process, so the large path never collects it anywhere); the
    vocabulary size V is the one driver scalar. The per-doc reduce
    sums INTEGER picolog units (each row's tf*ln scaled 1e12 and
    rounded), so the distributed sum is order-free bit-exact; the 1e-10
    worst-case quantization is far inside the 6-decimal round. Docs
    with <2 tokens have no bigrams and drop, like the oracle."""
    from collections import Counter

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def bigram_tf(t: pa.Table) -> pa.Table:
        """(doc_id, bigram, w1, tf) rows — tf is complete per doc.
        \\x1f joins the pair (Python str.split treats \\x1c-\\x1f as
        whitespace, so no token can contain it)."""
        ids, bgs, w1s, tfs = [], [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            toks = (text or "").split()
            c: Counter = Counter(zip(toks, toks[1:]))
            ids.extend([doc_id] * len(c))
            bgs.extend(f"{a}\x1f{b}" for a, b in c)
            w1s.extend(a for a, _ in c)
            tfs.extend(c.values())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "bigram": pa.array(bgs, pa.string()),
                         "w1": pa.array(w1s, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    tf = docs.map_batches(bigram_tf, batch_format="pyarrow")
    # corpus bigram counts: one distributed reduce over the tf rows;
    # PREFIX counts then derive from this already-reduced frame (split
    # the bigram key back apart) instead of re-tokenizing the corpus —
    # the cp reduce runs over distinct-bigram rows, not corpus rows.
    # Per-block combine first: the shuffle carries each block's
    # distinct-bigram partials, not its per-doc tf rows (the standard
    # combiner; at natural-language bigram cardinality the partial
    # frame is still far below the row count).
    cb = (tf.map_batches(
              lambda t: (t.select(["bigram", "tf"]).group_by("bigram")
                         .aggregate([("tf", "sum")])
                         .rename_columns(["bigram", "tf"])),
              batch_format="pyarrow")
          .groupby("bigram").aggregate(Sum("tf", alias_name="cb")))
    cp = (cb.map_batches(
            lambda t: pa.table({
                "w1": pc.list_element(pc.split_pattern(
                    t["bigram"].combine_chunks(), "\x1f"), 0),
                "cb": t["cb"]}),
            batch_format="pyarrow")
          .groupby("w1").aggregate(Sum("cb", alias_name="cp")))
    # V = distinct unigrams (the one scalar that reaches the driver)
    vocab = (docs.map_batches(
        lambda t: _word_pairs(t).group_by("word").aggregate([]),
        batch_format="pyarrow").groupby("word").count().count())

    # join-strategy switch by side size (the house broadcast/hash rule,
    # cf. stages/join.py): when the DISTINCT-BIGRAM frame itself is
    # small the whole LM is two dicts — ship them once via ray.put and
    # score in ONE pure map, collapsing two hash-join barriers;
    # otherwise (a web-scale bigram vocabulary fits no single process)
    # the partitioned joins run unchanged. The cheap corpus-bytes
    # pre-filter only bounds what we dare materialize to COUNT the
    # reduced frame — the broadcast decision itself is made on that
    # count, not on compressed input bytes (a 250 MB parquet can hide
    # tens of millions of bigrams). test_queries_oracle pins both
    # paths identical.
    corpus_bytes = _tbytes(sf_dir, "documents")
    use_broadcast = False
    if corpus_bytes <= broadcast_threshold_bytes:
        cb = cb.materialize()  # object-store-backed, spillable
        use_broadcast = cb.count() <= 2_000_000  # dict stays sub-GB
    if use_broadcast:
        cb_pdf = cb.to_pandas()  # distinct-bigram frame: small by gate
        cb_ref = ray.put(dict(zip(cb_pdf["bigram"], cb_pdf["cb"])))
        cp_pdf = (cb_pdf.assign(
            w1=[b.split("\x1f", 1)[0] for b in cb_pdf["bigram"]])
            .groupby("w1", sort=False)["cb"].sum().reset_index(name="cp"))
        cp_ref = ray.put(dict(zip(cp_pdf["w1"], cp_pdf["cp"])))

        def enrich(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["cb"] = df["bigram"].map(broadcast_get(cb_ref)).astype(
                np.int64)
            df["cp"] = df["w1"].map(broadcast_get(cp_ref)).astype(np.int64)
            return df

        j = tf.map_batches(enrich, batch_format="pandas")
    else:
        buckets = join_buckets(corpus_bytes)
        j = hash_join(tf, cb, on="bigram", buckets=buckets)
        j = hash_join(j, cp, on="w1", buckets=buckets)

    def partial(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        cbv = t["cb"].to_numpy(zero_copy_only=False).astype(np.float64)
        cpv = t["cp"].to_numpy(zero_copy_only=False).astype(np.float64)
        lp = tfv * np.log((cbv + 1.0) / (cpv + float(vocab)))
        # integer picolog units -> the cross-block Sum is order-free
        tt = pa.table({"doc_id": t["doc_id"],
                       "lp_e12": pa.array(
                           np.floor(lp * 1e12 + 0.5).astype(np.int64)),
                       "tf": t["tf"]})
        return (tt.group_by("doc_id")
                .aggregate([("lp_e12", "sum"), ("tf", "sum")])
                .rename_columns(["doc_id", "lp_e12", "tf"]))

    out = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Sum("lp_e12", alias_name="lp_e12"),
                      Sum("tf", alias_name="n_bigrams"))
           .to_pandas())
    out["avg_lp6"] = np.round(
        out["lp_e12"].to_numpy(np.float64) / 1e12
        / out["n_bigrams"].to_numpy(np.float64), 6)
    out["n_bigrams"] = out["n_bigrams"].astype("int64")
    out = out.drop(columns=["lp_e12"]).sort_values("doc_id")
    return out.reset_index(drop=True)[["doc_id", "n_bigrams", "avg_lp6"]]


def lead_lag_events(sf_dir: str) -> pd.DataFrame:
    """LAG/LEAD window functions per key: for every event, the gap (us)
    since the same user's previous event and the type of their next
    one. Same physical plan as ``running_events``: the user key is the
    parallelism unit, one hash co-partition, vectorized diff/shift per
    group — no global sort. Sentinels (-1 / '') stand in for the
    NULLs so both sides hash integer/string-exact."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts_us = series_ts_us(g["ts"]).to_numpy()
        gap = np.full(len(g), -1, dtype=np.int64)
        gap[1:] = np.diff(ts_us)
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "prev_gap_us": gap,
            "next_type": g["event_type"].shift(-1).fillna("").to_numpy(),
        })

    out = (ds.groupby("user_id").map_groups(fn, batch_format="pandas")
           .to_pandas())
    return out.sort_values("event_id").reset_index(drop=True)


def customer_order_stats(sf_dir: str) -> pd.DataFrame:
    """LEFT OUTER join with zero-fill: per-customer order count and
    total spend INCLUDING never-ordered customers (the anti-join rows,
    surfaced with their aggregate instead of filtered). Orders first
    reduce to one row per custkey (distributed groupby — the fact
    table never reaches the join at row grain), then a partitioned
    left-outer hash join against customer; null aggregate columns
    zero-fill. Both sides stream; nothing driver-side."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    # ONE custkey co-partition replaces the custkey-domain groupby plus
    # the separate hash-join exchange (the `_fulfillment_lag_hist`
    # shape — a custkey-domain group count priced that shuffle): both
    # sides pre-reduce per block, union under one typed schema, and the
    # shards-sized groupby co-locates each customer's rows; the
    # left-outer merge and zero-fill happen inside the shard task.
    _schema = pa.schema([("c_custkey", pa.int64()),
                         ("c_mktsegment", pa.string()),
                         ("n_orders", pa.int64()),
                         ("cents", pa.int64()),
                         ("_shard", pa.int64())])

    def o_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        g = (pa.table({"c_custkey": t["o_custkey"], "cents": cents})
             .group_by("c_custkey")
             .aggregate([([], "count_all"), ("cents", "sum")])
             .rename_columns(["c_custkey", "n_orders", "cents"]))
        g = pa.table({"c_custkey": g["c_custkey"],
                      "c_mktsegment": pa.nulls(len(g), pa.string()),
                      "n_orders": g["n_orders"],
                      "cents": g["cents"]})
        return add_shard_column(g, "c_custkey", 32).cast(_schema)

    def c_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        g = pa.table({"c_custkey": t["c_custkey"],
                      "c_mktsegment": t["c_mktsegment"],
                      "n_orders": pa.nulls(len(t), pa.int64()),
                      "cents": pa.nulls(len(t), pa.int64())})
        return add_shard_column(g, "c_custkey", 32).cast(_schema)

    u = (orders.map_batches(o_partial, batch_format="pyarrow")
         .union(cust.map_batches(c_partial, batch_format="pyarrow")))

    def shard_merge(g: pd.DataFrame) -> pd.DataFrame:
        c_rows = g[g["c_mktsegment"].notna()]
        o_rows = g[g["c_mktsegment"].isna()]
        agg = (o_rows.groupby("c_custkey", sort=False)
               .agg(n_orders=("n_orders", "sum"), cents=("cents", "sum"))
               .reset_index())
        m = c_rows[["c_custkey", "c_mktsegment"]].merge(
            agg, on="c_custkey", how="left")
        m["n_orders"] = m["n_orders"].fillna(0).astype("int64")
        m["total_spent"] = np.round(
            m["cents"].fillna(0).astype("float64") / 100.0, 2)
        return m[["c_custkey", "c_mktsegment", "n_orders", "total_spent"]]

    out = (u.groupby("_shard").map_groups(shard_merge,
                                          batch_format="pandas")
           .to_pandas())
    return (out.sort_values("c_custkey").reset_index(drop=True)
            [["c_custkey", "c_mktsegment", "n_orders", "total_spent"]])


def pq_encode_embeddings(sf_dir: str) -> pd.DataFrame:
    """Product-quantization encode of the embedding corpus (rows-only:
    codebook training is k-means, not ANSI SQL; quality is pinned by
    ``tests/test_pq.py`` — reconstruction error below the int-grid
    bound and ADC top-k recall vs exact search). Codes surface as a
    compact hex string per vector (m=8 uint8 ids)."""
    from ..stages.pq import pq_encode

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    codes, _books = pq_encode(ds)
    out = codes.to_pandas()
    out["codes"] = out["codes"].map(lambda c: bytes(list(c)).hex())
    return out.sort_values("vec_id").reset_index(drop=True)


def ntile_documents(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """Exact global NTILE(k) over (n_chars, doc_id) with NO global
    sort: the global rank decomposes into a bounded-domain histogram
    (per-value counts -> driver -> exclusive cumsum = each value's
    base rank, the ``long_docs_p90`` trick) plus a within-value rank
    (one hash co-partition on n_chars, vectorized argsort per group).
    The only exchange is the co-partition; the histogram is
    value-domain-sized. Bucket boundaries follow SQL NTILE semantics
    (first N%k buckets one row bigger). This is the quartile/decile
    bucketing a length-stratified curriculum sampler needs."""
    docs = _t(sf_dir, "documents", ["doc_id", "n_chars"])

    hist = (docs.map_batches(
        lambda t: t.group_by("n_chars").aggregate([([], "count_all")]),
        batch_format="pyarrow")
        .groupby("n_chars").aggregate(Sum("count_all", alias_name="cnt"))
        .to_pandas().sort_values("n_chars"))  # value-domain-sized
    n_total = int(hist["cnt"].sum())
    base = dict(zip(hist["n_chars"].astype(np.int64),
                    np.concatenate([[0], hist["cnt"].cumsum()
                                    .to_numpy()[:-1]]).astype(np.int64)))
    base_ref = ray.put(base)
    size_small, r = divmod(n_total, k)
    big_span = r * (size_small + 1)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        b = broadcast_get(base_ref)[int(g["n_chars"].iloc[0])]
        rank0 = b + np.arange(len(g), dtype=np.int64)
        if size_small == 0:  # fewer rows than buckets
            q = rank0 + 1
        else:
            q = np.where(
                rank0 < big_span,
                rank0 // (size_small + 1),
                r + (rank0 - big_span) // size_small) + 1
        return pd.DataFrame({"doc_id": g["doc_id"],
                             "n_chars": g["n_chars"],
                             "q4": q.astype(np.int64)})

    out = (docs.groupby("n_chars")
           .map_groups(rank_group, batch_format="pandas").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def exact_sample_events(sf_dir: str, n: int = 200) -> pd.DataFrame:
    """Exact-N deterministic global sample: the N events with the
    smallest Knuth multiplicative hash of their id (tie-break id) —
    the exact-cardinality sibling of ``sample_events`` (hash-threshold,
    approximate N). Partial bottom-N per batch means the driver merge
    sees blocks x N rows, never the corpus; the hash is a pure function
    of ids so the sample is layout/cluster-size invariant AND exactly
    reproducible in ANSI SQL (`(id * 2654435761) % 4294967296`)."""
    from ..stages.hashing import multiplicative_hash_u32

    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = multiplicative_hash_u32(df["event_id"].to_numpy())
        return (df.assign(_h=h.astype(np.uint64))
                .nsmallest(min(n, len(df)), ["_h", "event_id"]))

    reduced = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = reduced.nsmallest(min(n, len(reduced)), ["_h", "event_id"])
    return (out.drop(columns=["_h"]).sort_values("event_id")
            .reset_index(drop=True))


def mode_event_type_per_user(sf_dir: str) -> pd.DataFrame:
    """Grouped MODE (most frequent value per key, tie-break smallest
    value) — the categorical argmax every label-cleaning pass needs.
    Same order-encoding-key trick as ``rare_terms_documents``: counts
    reduce per (user, type), then ONE hash-combining Min over
    'inverted-count || type' picks the winner per user — partials
    combine per block, so no per-group sort and no second wide
    shuffle."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])
    counts = (ds.groupby(["user_id", "event_type"])
              .aggregate(Count(alias_name="n")))

    def keyed(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.utf8_lpad(pc.cast(pc.subtract(pa.scalar(10 ** 8), t["n"]),
                                 pa.string()), 8, "0"),
            t["event_type"].combine_chunks(), "")
        return pa.table({"user_id": t["user_id"], "key": key})

    out = (counts.map_batches(keyed, batch_format="pyarrow")
           .groupby("user_id").aggregate(Min("key", alias_name="key"))
           .to_pandas())
    out["n"] = (10 ** 8 - out["key"].str[:8].astype("int64"))
    out["mode_type"] = out["key"].str[8:]
    out = out.drop(columns=["key"]).sort_values("user_id")
    out["user_id"] = out["user_id"].astype("int64")
    return out.reset_index(drop=True)[["user_id", "mode_type", "n"]]


def corr_value_hour_by_type(sf_dir: str) -> pd.DataFrame:
    """Grouped Pearson correlation (value vs hour-of-day per
    event_type) from five INTEGER-EXACT moment sums: value is
    cent-quantized (x100 -> int64) and hour is a small int, so the
    per-batch (n, Sx, Sy, Sxy, Sxx, Syy) partials and their
    cross-block sums are exact integers — bit-identical on any
    layout/cluster size — and the float arithmetic happens once, on
    the groups-sized frame. The oracle is the same closed form over
    SQL integer sums (NOT corr(): single-pass streaming corr
    accumulates float error this formulation never incurs)."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        x = np.round(t["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        ts_us = np.asarray(column_ts_us(t["ts"]))
        y = (ts_us // HOUR_US) % 24
        tt = pa.table({"event_type": t["event_type"],
                       "x": pa.array(x), "y": pa.array(y),
                       "xy": pa.array(x * y), "xx": pa.array(x * x),
                       "yy": pa.array(y * y)})
        return (tt.group_by("event_type")
                .aggregate([([], "count_all"), ("x", "sum"), ("y", "sum"),
                            ("xy", "sum"), ("xx", "sum"), ("yy", "sum")])
                .rename_columns(["event_type", "n", "sx", "sy",
                                 "sxy", "sxx", "syy"]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("syy", alias_name="syy"))
           .to_pandas())  # groups-sized
    n = agg["n"].to_numpy(np.float64)
    sx, sy = agg["sx"].to_numpy(np.float64), agg["sy"].to_numpy(np.float64)
    sxy = agg["sxy"].to_numpy(np.float64)
    sxx, syy = agg["sxx"].to_numpy(np.float64), agg["syy"].to_numpy(np.float64)
    cov = n * sxy - sx * sy
    den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    corr = np.where(den == 0, np.nan, cov / np.where(den == 0, 1.0, den))
    out = pd.DataFrame({"event_type": agg["event_type"],
                        "n": agg["n"].astype("int64"),
                        "corr6": np.round(corr, 6)})
    return out.sort_values("event_type").reset_index(drop=True)

def moving_sum_events(sf_dir: str, w: int = 3) -> pd.DataFrame:
    """Bounded ROWS window (moving sum over the last ``w`` events per
    user) — the rate-limiter / rolling-spend primitive. Cent-quantized
    int64 cumsum-difference per group, so the moving sums are exact
    integers on any layout. One hash co-partition on the user key; the
    window never crosses users, so no block-boundary carry exists."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        cents = np.round(g["value"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(cents)])
        idx = np.arange(len(g), dtype=np.int64)
        lo = np.maximum(idx - (w - 1), 0)
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "mov_sum_cents": cs[idx + 1] - cs[lo],
            "n_window": np.minimum(idx + 1, w),
        })

    out = (ds.groupby("user_id").map_groups(fn, batch_format="pandas")
           .to_pandas())
    return out.sort_values("event_id").reset_index(drop=True)


def event_path_per_user(sf_dir: str) -> pd.DataFrame:
    """Ordered string aggregation (the per-user event-type journey,
    ``string_agg(... ORDER BY ts)``) — the sequence feature a funnel /
    markov model trains on. The user key is the parallelism unit; each
    group sorts locally and joins once — paths never pass through the
    driver unconcatenated."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "path": [">".join(g["event_type"])],
            "n_events": [np.int64(len(g))],
        })

    out = (ds.groupby("user_id").map_groups(fn, batch_format="pandas")
           .to_pandas())
    return out.sort_values("user_id").reset_index(drop=True)


def dense_rank_orders(sf_dir: str) -> pd.DataFrame:
    """DENSE_RANK per group with NO global sort: price buckets
    (floor(total/1000)) have a bounded value domain, so the distinct
    (priority, bucket) set reduces to a tiny frame (the ``ntile``
    histogram trick), ranks assign driver-side, and a broadcast
    searchsorted maps every row — one small shuffle of the distinct
    keys, everything else is a pure map."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority",
                               "o_totalprice"])

    def bucketed(t: pa.Table) -> pa.Table:
        bkt = pc.cast(pc.floor(pc.divide(t["o_totalprice"], 1000.0)),
                      pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_orderpriority": t["o_orderpriority"],
                         "bucket": bkt})

    withb = ds.map_batches(bucketed, batch_format="pyarrow")
    distinct = (withb.map_batches(
        lambda t: t.group_by(["o_orderpriority", "bucket"]).aggregate([]),
        batch_format="pyarrow")
        .groupby(["o_orderpriority", "bucket"])
        .aggregate(Count(alias_name="_n")).to_pandas())  # value-domain-sized
    ranks = {
        prio: np.sort(sub["bucket"].to_numpy(np.int64))
        for prio, sub in distinct.groupby("o_orderpriority")
    }
    ranks_ref = ray.put(ranks)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        table = broadcast_get(ranks_ref)
        drank = np.empty(len(df), dtype=np.int64)
        bkt = df["bucket"].to_numpy(np.int64)
        for prio, m in ((p, df["o_orderpriority"].to_numpy() == p)
                        for p in np.unique(df["o_orderpriority"])):
            drank[m] = np.searchsorted(table[prio], bkt[m]) + 1
        return df.assign(drank=drank)

    out = withb.map_batches(assign, batch_format="pandas").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def cume_dist_orders(sf_dir: str) -> pd.DataFrame:
    """CUME_DIST per group without a global sort: per-(priority, cents)
    counts reduce to a distinct-value-sized frame, cumulative counts
    assign driver-side, and a broadcast searchsorted(side='right') maps
    each row to its count-less-or-equal — exact integers until the one
    final division. Value-domain-sized exchange only (prices are
    bounded-domain cents; the frame never scales with row count)."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority",
                               "o_totalprice"])

    _cdf_schema = pa.schema([("o_orderpriority", pa.string()),
                             ("cents", pa.int64()), ("n", pa.int64())])

    def centify(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # keep the schema on empty blocks
            return _cdf_schema.empty_table()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        tt = pa.table({"o_orderpriority": t["o_orderpriority"],
                       "cents": cents})
        return (tt.group_by(["o_orderpriority", "cents"])
                .aggregate([([], "count_all")])
                .rename_columns(["o_orderpriority", "cents", "n"])
                .cast(_cdf_schema))

    hist = (ds.map_batches(centify, batch_format="pyarrow")
            .groupby(["o_orderpriority", "cents"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())  # distinct-value-sized
    cdf = {}
    for prio, sub in hist.groupby("o_orderpriority"):
        sub = sub.sort_values("cents")
        cum = sub["n"].to_numpy(np.int64).cumsum()
        cdf[prio] = (sub["cents"].to_numpy(np.int64), cum, int(cum[-1]))
    cdf_ref = ray.put(cdf)

    def assign(t: pa.Table) -> pa.Table:
        table = broadcast_get(cdf_ref)
        prios = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        cd = np.empty(len(t), dtype=np.float64)
        for p in np.unique(prios):
            vals, cum, n = table[p]
            m = prios == p
            cd[m] = cum[np.searchsorted(vals, cents[m], side="right") - 1] / n
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_orderpriority": pa.array(prios),
                         "cd6": pa.array(np.round(cd, 6))})

    out = ds.map_batches(assign, batch_format="pyarrow").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def value_histogram_events(sf_dir: str) -> pd.DataFrame:
    """Fixed-width binned histogram (count + exact cent sum per bucket)
    — the distribution profile a quality dashboard plots. Per-batch
    bucketing + Arrow partial aggregate means the shuffle carries at
    most n_buckets rows per block, never events."""
    ds = _t(sf_dir, "events", ["value"])

    _hist_schema = pa.schema([("bucket", pa.int64()), ("n", pa.int64()),
                              ("sum_cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # keep the schema on empty blocks
            return _hist_schema.empty_table()
        cents = np.round(t["value"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        bkt = np.minimum(np.maximum(cents // 2500, 0), 19)
        tt = pa.table({"bucket": pa.array(bkt), "cents": pa.array(cents)})
        return (tt.group_by("bucket")
                .aggregate([([], "count_all"), ("cents", "sum")])
                .rename_columns(["bucket", "n", "sum_cents"])
                .cast(_hist_schema))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("bucket")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sum_cents", alias_name="sum_cents"))
           .to_pandas())
    for c in ("n", "sum_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def token_entropy_documents(sf_dir: str) -> pd.DataFrame:
    """Per-document unigram Shannon entropy (repetition / diversity
    quality signal, the information-theoretic sibling of
    ``repetition_filter_documents``). Fully vectorized per batch with
    NO per-row loop: one regex split, dictionary-encode the flattened
    tokens, count (doc, token) pairs with one np.unique over composite
    int64 keys, then bincount the c*ln(c) contributions back to docs.
    Pure map — no shuffle at all."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t["text"])
        keep = pc.not_equal(trimmed, "")
        doc_id = t["doc_id"].filter(keep).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern_regex(trimmed.filter(keep),
                                      r"\s+").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        codes = pc.dictionary_encode(flat).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = int(codes.max()) + 1 if len(codes) else 1
        doc_idx = np.repeat(np.arange(len(doc_id), dtype=np.int64), lens)
        pair_keys, counts = np.unique(doc_idx * vocab + codes,
                                      return_counts=True)
        contrib = counts.astype(np.float64) * np.log(counts)
        sums = np.bincount(pair_keys // vocab, weights=contrib,
                           minlength=len(doc_id))
        n_tok = lens.astype(np.float64)
        entropy = np.log(n_tok) - sums / n_tok
        return pa.table({"doc_id": pa.array(doc_id),
                         "n_tokens": pa.array(lens.astype(np.int64)),
                         "entropy6": pa.array(np.round(entropy, 6))})

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_LEV_PROBE = "small widget"


def _levenshtein_batch(arr: pa.Array, probe: str) -> np.ndarray:
    """Batch Levenshtein against a fixed probe, vectorized ACROSS rows:
    the padded byte matrix comes straight from the Arrow string buffers
    (no per-row Python), and the DP runs len(s_max) x len(probe)
    iterations of whole-batch numpy ops — the per-element work is
    C-speed regardless of batch size."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(offs)
    n, m_max = len(arr), int(lens.max()) if len(arr) else 0
    span = np.arange(m_max, dtype=np.int64)
    active_all = span[None, :] < lens[:, None]
    idx = np.minimum(offs[:-1, None] + span[None, :], len(data) - 1)
    mat = np.where(active_all, data[idx], 0)

    q = np.frombuffer(probe.encode(), dtype=np.uint8)
    mq = len(q)
    dp = np.broadcast_to(np.arange(mq + 1, dtype=np.int64),
                         (n, mq + 1)).copy()
    for i in range(m_max):
        act = active_all[:, i]
        c = mat[:, i]
        new = np.empty_like(dp)
        new[:, 0] = dp[:, 0] + 1
        for j in range(1, mq + 1):
            cost = (c != q[j - 1]).astype(np.int64)
            new[:, j] = np.minimum(np.minimum(dp[:, j] + 1,
                                              new[:, j - 1] + 1),
                                   dp[:, j - 1] + cost)
        dp = np.where(act[:, None], new, dp)
    return dp[:, mq]


def edit_distance_parts(sf_dir: str) -> pd.DataFrame:
    """Levenshtein edit distance of every part name to a probe string
    (fuzzy-match scoring, the approximate-string sibling of the n-gram
    Jaccard ops). Pure map; the DP kernel is row-vectorized numpy over
    the raw Arrow buffers, not a Python loop per string."""
    ds = _t(sf_dir, "part", ["p_partkey", "p_name"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": t["p_partkey"],
            "dist": pa.array(_levenshtein_batch(
                t["p_name"].combine_chunks(), _LEV_PROBE)),
        })

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    return out.sort_values("p_partkey").reset_index(drop=True)


def argmax_event_per_type(sf_dir: str) -> pd.DataFrame:
    """Grouped ARG_MAX (MAX_BY: the event id holding each type's
    maximum value, tie-break smallest id) via the same order-encoding
    trick as ``mode_event_type_per_user``: one hash-combining Min over
    'inverted-cents || id' — partials fold inside every block, so the
    shuffle carries one row per (block, group) and there is no per-group
    sort anywhere."""
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    _key_schema = pa.schema([("event_type", pa.string()),
                             ("key", pa.string())])

    def keyed(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # keep the schema on empty blocks
            return _key_schema.empty_table()
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        # bias by 10^9-1 (NOT 10^9): cents==0 must still encode in 9
        # digits or the lexicographic order breaks at the boundary
        key = pc.binary_join_element_wise(
            pc.utf8_lpad(pc.cast(pc.subtract(pa.scalar(10 ** 9 - 1), cents),
                                 pa.string()), 9, "0"),
            pc.utf8_lpad(pc.cast(t["event_id"], pa.string()), 12, "0"), "")
        return pa.table({"event_type": t["event_type"], "key": key})

    out = (ds.map_batches(keyed, batch_format="pyarrow")
           .groupby("event_type").aggregate(Min("key", alias_name="key"))
           .to_pandas())
    cents = 10 ** 9 - 1 - out["key"].str[:9].astype("int64")
    out["best_event_id"] = out["key"].str[9:].astype("int64")
    # cents/100.0 is the SAME double both sides (int -> nearest double,
    # one division) so no rounding step is needed for the value hash
    out["max_value"] = cents.to_numpy(np.float64) / 100.0
    out = out.drop(columns=["key"]).sort_values("event_type")
    return out.reset_index(drop=True)[
        ["event_type", "best_event_id", "max_value"]]

def linreg_value_hour_by_type(sf_dir: str) -> pd.DataFrame:
    """Grouped least-squares regression (value vs hour-of-day per event
    type): slope + intercept from the same five integer-exact moment
    sums as ``corr_value_hour_by_type`` — partials fold per block, the
    float arithmetic runs once on the groups-sized frame with the SAME
    expression shape as the oracle, so the doubles match bit-for-bit
    before the final round."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        y = np.round(t["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        ts_us = np.asarray(column_ts_us(t["ts"]))
        x = (ts_us // HOUR_US) % 24
        tt = pa.table({"event_type": t["event_type"],
                       "x": pa.array(x), "y": pa.array(y),
                       "xy": pa.array(x * y), "xx": pa.array(x * x)})
        return (tt.group_by("event_type")
                .aggregate([([], "count_all"), ("x", "sum"), ("y", "sum"),
                            ("xy", "sum"), ("xx", "sum")])
                .rename_columns(["event_type", "n", "sx", "sy",
                                 "sxy", "sxx"]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx"))
           .to_pandas())  # groups-sized
    n = agg["n"].to_numpy(np.float64)
    sx, sy = agg["sx"].to_numpy(np.float64), agg["sy"].to_numpy(np.float64)
    sxy, sxx = agg["sxy"].to_numpy(np.float64), agg["sxx"].to_numpy(np.float64)
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / n
    out = pd.DataFrame({"event_type": agg["event_type"],
                        "n": agg["n"].astype("int64"),
                        "slope6": np.round(slope, 6),
                        "intercept6": np.round(intercept, 6)})
    return out.sort_values("event_type").reset_index(drop=True)


def dow_orders(sf_dir: str) -> pd.DataFrame:
    """Day-of-week rollup (calendar-dimension aggregation): the dow
    derives arithmetically from the epoch (1970-01-01 + 4 = Thursday
    anchor), so both engines share one locale-free formula. Per-batch
    Arrow partials mean the shuffle carries at most 7 rows per block."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    _schema = pa.schema([("dow", pa.int64()), ("n_orders", pa.int64()),
                         ("sum_cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        days = np.asarray(column_ts_us(t["o_orderdate"])) // (86400 * US)
        dow = (days + 4) % 7
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        tt = pa.table({"dow": pa.array(dow), "cents": pa.array(cents)})
        return (tt.group_by("dow")
                .aggregate([([], "count_all"), ("cents", "sum")])
                .rename_columns(["dow", "n_orders", "sum_cents"])
                .cast(_schema))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("dow")
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("sum_cents", alias_name="sum_cents"))
           .to_pandas())
    out["total"] = out["sum_cents"].to_numpy(np.float64) / 100.0
    out = out.drop(columns=["sum_cents"])
    for c in ("dow", "n_orders"):
        out[c] = out[c].astype("int64")
    return out.sort_values("dow").reset_index(drop=True)


def event_trigrams(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Sequential pattern mining: the top-k 3-step event-type paths
    across all user journeys. Users co-partition into a FIXED shard
    count (not one group per user — per-user map_groups pays a Python
    call per key); each shard sorts once and builds every user's
    trigrams in one vectorized pass with boundary masking, pre-counting
    locally so the global reduce is alphabet^3-sized."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())),
                        pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy()
        if len(t) < 3:
            return pd.DataFrame({"trigram": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        # a trigram is valid only where all three rows share the user
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        s = (pd.Series(t[:-2]) + ">" + pd.Series(t[1:-1]) + ">"
             + pd.Series(t[2:]))[same]
        vc = s.value_counts()
        return pd.DataFrame({"trigram": vc.index.to_numpy(),
                             "n": vc.to_numpy(np.int64)})

    # shards x alphabet^3 rows: a driver merge beats a second exchange
    counts = (ds.map_batches(sharded, batch_format="pyarrow")
              .groupby("_shard").map_groups(per_shard, batch_format="pandas")
              .to_pandas()
              .groupby("trigram", as_index=False)["n"].sum())
    counts["n"] = counts["n"].astype("int64")
    out = counts.sort_values(["n", "trigram"],
                             ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def iqr_outliers_events(sf_dir: str) -> pd.DataFrame:
    """Per-group IQR fence outlier profile (Tukey's rule) computed
    ENTIRELY from one distinct-value-sized histogram: cents counts per
    (type, value) reduce once, then quantiles (inverted-CDF ==
    DuckDB's quantile_disc), the fence comparison (kept in integers:
    2c > 5*q3 - 3*q1 <=> c > q3 + 1.5*IQR) and the outlier count all
    read the same tiny frame — no second pass over the data."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    _schema = pa.schema([("event_type", pa.string()),
                         ("cents", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        cents = np.round(t["value"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        tt = pa.table({"event_type": t["event_type"],
                       "cents": pa.array(cents)})
        return (tt.group_by(["event_type", "cents"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "cents", "n"])
                .cast(_schema))

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())  # distinct-value-sized
    rows = []
    for etype, sub in hist.groupby("event_type"):
        sub = sub.sort_values("cents")
        vals = sub["cents"].to_numpy(np.int64)
        cnt = sub["n"].to_numpy(np.int64)
        cum = cnt.cumsum()
        n = int(cum[-1])
        # inverted CDF: smallest value whose cumulative count reaches
        # ceil(q*n) — exact integer ranks, no float quantile math
        q1c = int(vals[np.searchsorted(cum, (n + 3) // 4)])
        q3c = int(vals[np.searchsorted(cum, (3 * n + 3) // 4)])
        n_out = int(cnt[2 * vals > 5 * q3c - 3 * q1c].sum())
        rows.append((etype, q1c, q3c, n_out))
    out = pd.DataFrame(rows, columns=["event_type", "q1_cents",
                                      "q3_cents", "n_outliers"])
    for c in ("q1_cents", "q3_cents", "n_outliers"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def embedding_norms(sf_dir: str) -> pd.DataFrame:
    """Vector scalar profile (L2 and L-inf norms per embedding),
    integer-exact: elements quantize to e6 ints FIRST (floor(x*1e6 +
    0.5), round-half-up both sides), the squared sum is exact int64,
    and the one sqrt runs on identical integers in both engines. Pure
    vectorized map over the flattened fixed-dim list column."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def fn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([("vec_id", pa.int64()),
                              ("l2_q", pa.int64()),
                              ("linf_q", pa.int64())]).empty_table()
        flat = pc.list_flatten(t["embedding"].combine_chunks())
        dim = len(flat) // len(t)
        x = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        xq = np.floor(x * 1e6 + 0.5).astype(np.int64).reshape(len(t), dim)
        l2 = np.floor(np.sqrt((xq * xq).sum(axis=1).astype(np.float64))
                      + 0.5).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"],
                         "l2_q": pa.array(l2),
                         "linf_q": pa.array(np.abs(xq).max(axis=1))})

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def chi2_type_hour(sf_dir: str) -> pd.DataFrame:
    """Chi-square independence statistic (event_type x hour-of-day
    contingency): observed counts reduce to a groups-x-24 frame (never
    scales with rows), the expected-frequency grid and the statistic
    compute driver-side from exact integer marginals. The categorical
    drift detector a data-quality monitor runs per batch."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    _schema = pa.schema([("event_type", pa.string()), ("h", pa.int64()),
                         ("o", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        h = (np.asarray(column_ts_us(t["ts"])) // HOUR_US) % 24
        tt = pa.table({"event_type": t["event_type"], "h": pa.array(h)})
        return (tt.group_by(["event_type", "h"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "h", "o"]).cast(_schema))

    c = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby(["event_type", "h"]).aggregate(Sum("o", alias_name="o"))
         .to_pandas())  # groups x 24
    pivot = c.pivot_table(index="event_type", columns="h", values="o",
                          aggfunc="sum", fill_value=0)
    obs = pivot.to_numpy(np.float64)
    rt = obs.sum(axis=1, keepdims=True)
    ct = obs.sum(axis=0, keepdims=True)
    n = obs.sum()
    e = rt * ct / n
    chi2 = ((obs - e) ** 2 / e).sum(axis=1)
    out = pd.DataFrame({"event_type": pivot.index,
                        "chi2_4": np.round(chi2, 4)})
    return out.sort_values("event_type").reset_index(drop=True)


def weighted_avg_lineitem(sf_dir: str) -> pd.DataFrame:
    """Weighted mean (quantity-weighted average unit price per return
    flag) from two exact integer sums — the canonical 'weighted
    aggregate' a mixture sampler or a cost model needs. Partials fold
    per block; one division at the end."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice",
                                 "l_quantity"])

    _schema = pa.schema([("l_returnflag", pa.string()),
                         ("num", pa.int64()), ("den", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        cents = np.round(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        qty = np.round(t["l_quantity"].to_numpy(zero_copy_only=False)
                       ).astype(np.int64)
        tt = pa.table({"l_returnflag": t["l_returnflag"],
                       "num": pa.array(cents * qty), "den": pa.array(qty)})
        return (tt.group_by("l_returnflag")
                .aggregate([("num", "sum"), ("den", "sum")])
                .rename_columns(["l_returnflag", "num", "den"])
                .cast(_schema))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("l_returnflag")
           .aggregate(Sum("num", alias_name="num"),
                      Sum("den", alias_name="den"))
           .to_pandas())
    wavg = agg["num"].to_numpy(np.float64) / agg["den"].to_numpy(np.float64)
    out = pd.DataFrame({"l_returnflag": agg["l_returnflag"],
                        "n_units": agg["den"].astype("int64"),
                        "wavg6": np.round(wavg / 100.0, 6)})
    return out.sort_values("l_returnflag").reset_index(drop=True)

def next_purchase_after_view(sf_dir: str) -> pd.DataFrame:
    """FORWARD as-of join (next-occurrence lookup): each view event
    enriched with the same user's next purchase value at-or-after the
    view — the time-to-conversion primitive. Purchases collapse to one
    row per (user, ts) via per-batch partial max (associative, so the
    driver only receives the reduced frame it must broadcast anyway),
    then ``broadcast_asof_join(direction='forward')`` runs as plain
    tasks with the sorted side cached once per worker."""
    def partial_max(t: pa.Table) -> pa.Table:
        df = (t.to_pandas().groupby(["user_id", "ts"], sort=False)
              ["value"].max().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    purchases = (
        _t(sf_dir, "events", ["user_id", "ts", "value", "event_type"],
           flt=(pc.field("event_type") == "purchase"))
        .map_batches(lambda t: t.drop_columns(["event_type"]),
                     batch_format="pyarrow")
        .map_batches(partial_max, batch_format="pyarrow")
        .to_pandas()
    )
    purchases = (purchases.groupby(["user_id", "ts"], sort=True)["value"]
                 .max().reset_index()
                 .rename(columns={"ts": "p_ts",
                                  "value": "next_purchase_value"}))
    views = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"],
               flt=(pc.field("event_type") == "view"))
    out = broadcast_asof_join(
        views, purchases, on="user_id", ts_col="ts",
        version_ts_col="p_ts",
        defaults={"next_purchase_value": 0.0}, concurrency=None,
        direction="forward",
    ).to_pandas()
    out = out[["event_id", "next_purchase_value"]]
    return out.sort_values("event_id").reset_index(drop=True)


WEEK_US = 7 * 86400 * US


def cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix (users grouped by first-activity week,
    counted in each later week): the growth-analytics operator. Users
    co-partition into fixed shards, so each user's distinct weeks,
    cohort (min week) and offsets all compute in ONE vectorized pass
    per shard; the global reduce is (cohorts x offsets)-sized."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def sharded(t: pa.Table) -> pa.Table:
        wk = pc.divide(column_ts_us(t["ts"]), WEEK_US)
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())),
                        pa.int64())
        tt = pa.table({"user_id": t["user_id"], "wk": wk,
                       "_shard": shard})
        return tt.group_by(["user_id", "wk", "_shard"]).aggregate([])

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "wk"])
        cohort = g.groupby("user_id")["wk"].transform("min")
        out = pd.DataFrame({"cohort_week": cohort.to_numpy(np.int64),
                            "week_offset": (g["wk"] - cohort)
                            .to_numpy(np.int64)})
        return (out.groupby(["cohort_week", "week_offset"], sort=False)
                .size().reset_index(name="n_users"))

    # shards x (cohorts x offsets) rows: driver merge, not an exchange
    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas()
           .groupby(["cohort_week", "week_offset"], as_index=False)
           ["n_users"].sum())
    out["n_users"] = out["n_users"].astype("int64")
    return (out.sort_values(["cohort_week", "week_offset"])
            .reset_index(drop=True))


GOPHER_STOPWORDS = ("the", "a", "of", "to", "and")


def gopher_rules_documents(sf_dir: str) -> pd.DataFrame:
    """Gopher-style rule-based quality gate, ORACLE-EXACT subset: word
    count bounds, mean word length band (kept in integer centichars:
    100*chars_no_space // n_words), and a minimum stop-word hit count —
    all via Arrow re2 kernels, one pure-map pass, keep flag in integer
    arithmetic. The heuristic lang-ID/quality siblings live in
    ``functions/text.py``; this is the SQL-checkable rule core."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    stop_pat = r"\b(" + "|".join(GOPHER_STOPWORDS) + r")\b"

    def fn(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        n_words = pc.cast(pc.count_substring_regex(text, r"\S+"),
                          pa.int64()).to_numpy(zero_copy_only=False)
        chars_ns = pc.cast(pc.utf8_length(
            pc.replace_substring(text, " ", "")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        stop_hits = pc.cast(pc.count_substring_regex(text, stop_pat),
                            pa.int64()).to_numpy(zero_copy_only=False)
        mwl_c = np.where(n_words > 0, 100 * chars_ns
                         // np.maximum(n_words, 1), 0)
        keep = ((n_words >= 5) & (n_words <= 100000)
                & (mwl_c >= 150) & (mwl_c <= 1000)
                & (stop_hits >= 1)).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_words": pa.array(n_words),
                         "mwl_c": pa.array(mwl_c),
                         "stop_hits": pa.array(stop_hits),
                         "keep_flag": pa.array(keep)})

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def orders_interarrival(sf_dir: str) -> pd.DataFrame:
    """Inter-arrival-time distribution (gap in days between a
    customer's consecutive orders, histogrammed): the repeat-behavior
    profile. Customers co-partition into fixed shards; one sort +
    boundary-masked diff per shard; per-shard gap counts pre-reduce so
    the global groupby is gap-domain-sized."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["o_custkey"],
                                        pa.scalar(31, pa.int64())),
                        pa.int64())
        return pa.table({"o_custkey": t["o_custkey"],
                         "o_orderkey": t["o_orderkey"],
                         "d_us": pa.array(
                             np.asarray(column_ts_us(t["o_orderdate"]))),
                         "_shard": shard})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "d_us", "o_orderkey"])
        cust = g["o_custkey"].to_numpy()
        d = g["d_us"].to_numpy()
        if len(g) < 2:
            return pd.DataFrame({"gap_days": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        same = cust[1:] == cust[:-1]
        gaps = ((d[1:] - d[:-1]) // (86400 * US))[same]
        vals, cnts = np.unique(gaps, return_counts=True)
        return pd.DataFrame({"gap_days": vals.astype(np.int64),
                             "n": cnts.astype(np.int64)})

    # the final reduce is gap-domain-sized (shards x |gaps| rows): a
    # driver merge beats a second Ray all-to-all exchange
    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas()
           .groupby("gap_days", as_index=False)["n"].sum())
    out["n"] = out["n"].astype("int64")
    return out.sort_values("gap_days").reset_index(drop=True)


def trending_types_hourly(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Windowed grouped top-k (the k busiest event types per tumbling
    hour): trend detection over event-time windows. Counts reduce to a
    (windows x alphabet)-sized frame with per-batch Arrow partials;
    the rank is a vectorized sort + cumcount on that reduced frame —
    the corpus itself never sorts."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    _schema = pa.schema([("event_type", pa.string()),
                         ("window_start", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        ws = pc.multiply(pc.divide(column_ts_us(t["ts"]), HOUR_US),
                         pa.scalar(HOUR_US, pa.int64()))
        tt = pa.table({"event_type": t["event_type"], "window_start": ws})
        return (tt.group_by(["event_type", "window_start"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "window_start", "n"])
                .cast(_schema))

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "window_start"])
              .aggregate(Sum("n", alias_name="n"))
              .to_pandas())  # windows x alphabet
    counts = counts.sort_values(["window_start", "n", "event_type"],
                                ascending=[True, False, True],
                                kind="mergesort")
    rank = counts.groupby("window_start").cumcount() + 1
    out = counts[rank <= k].copy()
    out["rank"] = rank[rank <= k].astype(np.int64)
    out["n"] = out["n"].astype("int64")
    out["window_start"] = us_to_timestamp_array(
        out["window_start"].to_numpy(np.int64))
    return (out.sort_values(["window_start", "rank"])
            .reset_index(drop=True)[["window_start", "event_type",
                                     "n", "rank"]])


def revenue_share_nation(sf_dir: str) -> pd.DataFrame:
    """Ratio-to-report (percent-of-total window): each nation's order
    revenue and its share within the nation's region. The orders side
    streams through a broadcast custkey->nation/region enrichment (the
    dimension chain customer x nation x region collapses to one small
    frame shipped once per actor); integer-cent partials fold per block
    so the shuffle carries 25 rows per block, and the window itself runs
    on the 25-row reduced frame."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation").to_pandas()
    reg = _t(sf_dir, "region").to_pandas()
    dim = (cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
           .merge(reg, left_on="n_regionkey", right_on="r_regionkey"))
    dim = dim[["c_custkey", "n_name", "r_name"]].rename(
        columns={"c_custkey": "o_custkey"})
    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = broadcast_join(ds, dim, on="o_custkey", how="inner",
                            concurrency=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["o_totalprice"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)
        g = (pd.DataFrame({"r_name": df["r_name"], "n_name": df["n_name"],
                           "cents": cents})
             .groupby(["r_name", "n_name"], sort=False)["cents"]
             .sum().reset_index())
        return g

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    out = (parts.groupby(["r_name", "n_name"], sort=True)["cents"]
           .sum().reset_index())
    out["revenue"] = out["cents"].to_numpy(np.float64) / 100.0
    region_tot = out.groupby("r_name")["cents"].transform("sum")
    out["share_ppm"] = _ppm(out["cents"].to_numpy(np.int64),
                            region_tot.to_numpy(np.int64))
    return (out.drop(columns=["cents"])
            .sort_values(["r_name", "n_name"]).reset_index(drop=True))


def mom_revenue_growth(sf_dir: str) -> pd.DataFrame:
    """Month-over-month growth (LAG over an aggregated series): exact
    integer-cent monthly revenue via per-block Arrow partials, then the
    percent-change window runs on the months-sized frame — the corpus
    never sorts. First month's growth is NULL/NaN on both engines."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    _schema = pa.schema([("month", pa.timestamp("us")),
                         ("cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        month = pc.cast(pc.floor_temporal(t["o_orderdate"], unit="month"),
                        pa.timestamp("us"))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"month": month, "cents": cents})
                .group_by("month").aggregate([("cents", "sum")])
                .rename_columns(["month", "cents"]).cast(_schema))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("month").aggregate(Sum("cents", alias_name="cents"))
           .to_pandas()).sort_values("month").reset_index(drop=True)
    cents = out["cents"].to_numpy(np.int64)
    prev = np.roll(cents, 1).astype(np.float64)
    growth = np.round((cents - np.roll(cents, 1)) / prev, 6)
    growth[0] = np.nan
    out["revenue"] = cents.astype(np.float64) / 100.0
    out["growth6"] = growth
    out["month"] = out["month"].astype("datetime64[us]")
    return out.drop(columns=["cents"])[["month", "revenue", "growth6"]]


def cumulative_new_users(sf_dir: str) -> pd.DataFrame:
    """Cumulative-distinct-over-time without a distinct window: each
    user's first-seen day via per-block Min partials + one user-keyed
    groupby, then new-user counts per day reduce to a days-sized frame
    whose running sum is a driver-side cumsum. This is the scalable
    rewrite of COUNT(DISTINCT) OVER (ORDER BY day)."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = pa.array(np.asarray(column_ts_us(t["ts"])))
        return (pa.table({"user_id": t["user_id"], "us": us})
                .group_by("user_id").aggregate([("us", "min")])
                .rename_columns(["user_id", "us"]))

    first = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("user_id").aggregate(Min("us", alias_name="us")))

    day_us = 86400 * US

    def per_day(t: pa.Table) -> pa.Table:
        day = pc.multiply(pc.divide(t["us"], day_us),
                          pa.scalar(day_us, pa.int64()))
        return (pa.table({"day": day}).group_by("day")
                .aggregate([([], "count_all")])
                .rename_columns(["day", "new_users"]))

    out = (first.map_batches(per_day, batch_format="pyarrow")
           .groupby("day").aggregate(Sum("new_users", alias_name="new_users"))
           .to_pandas()).sort_values("day").reset_index(drop=True)
    out["new_users"] = out["new_users"].astype("int64")
    out["cum_users"] = out["new_users"].cumsum().astype("int64")
    out["day"] = us_to_timestamp_array(out["day"].to_numpy(np.int64))
    return out[["day", "new_users", "cum_users"]]


def _skyline_points(cents: np.ndarray, size: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Non-dominated (min price, max size) points of a 2-D set.

    Distinct points sorted by (cents asc, size desc); a point survives
    iff it is its price's max size AND that size strictly exceeds every
    strictly-cheaper price's max size (prefix running max). Fully
    vectorized; equal (price, size) pairs never dominate each other so
    callers re-attach all rows matching a surviving point."""
    pts = np.unique(np.stack([cents, -size], axis=1), axis=0)
    c, s = pts[:, 0], -pts[:, 1]
    first_of_price = np.ones(len(c), dtype=bool)
    first_of_price[1:] = c[1:] != c[:-1]
    c, s = c[first_of_price], s[first_of_price]  # per-price max size
    keep = np.ones(len(c), dtype=bool)
    if len(c) > 1:
        keep[1:] = s[1:] > np.maximum.accumulate(s)[:-1]
    return c[keep], s[keep]


def pareto_parts(sf_dir: str) -> pd.DataFrame:
    """Skyline / Pareto frontier (dominance anti-join): the parts not
    dominated on (cheaper-or-equal price, larger-or-equal size with one
    strict). Skylines are mergeable — skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B)) — so each block reduces to its
    local frontier rows and only those tiny survivor sets reach the
    driver for the final pass; the quadratic NOT EXISTS never runs."""
    ds = _t(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])

    _schema = pa.schema([("p_partkey", pa.int64()),
                         ("p_retailprice", pa.float64()),
                         ("p_size", pa.int64())])

    def local_frontier(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        cents = np.round(t["p_retailprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        sc, ss = _skyline_points(cents, size)
        code = cents * (1 << 20) + size  # p_size < 2^20 by schema
        mask = np.isin(code, sc * (1 << 20) + ss)
        return pa.table({"p_partkey": t["p_partkey"].filter(pa.array(mask)),
                         "p_retailprice": pa.array(cents[mask] / 100.0),
                         "p_size": pa.array(size[mask])}).cast(_schema)

    cand = (ds.map_batches(local_frontier, batch_format="pyarrow")
            .to_pandas())  # union of per-block frontiers: tiny
    cents = np.round(cand["p_retailprice"].to_numpy(np.float64)
                     * 100.0).astype(np.int64)
    size = cand["p_size"].to_numpy(np.int64)
    sc, ss = _skyline_points(cents, size)
    mask = np.isin(cents * (1 << 20) + size, sc * (1 << 20) + ss)
    out = cand[mask].sort_values("p_partkey").reset_index(drop=True)
    out["p_partkey"] = out["p_partkey"].astype("int64")
    out["p_size"] = out["p_size"].astype("int64")
    return out[["p_partkey", "p_retailprice", "p_size"]]


def user_activity_streaks(sf_dir: str) -> pd.DataFrame:
    """Gaps-and-islands (longest run of consecutive active days per
    user): users co-partition into 32 fixed shards; each shard dedupes
    (user, day), sorts once, and finds island breaks with one vectorized
    diff — run lengths come from np.diff over break indices, never a
    per-user Python loop. The classic row_number() island trick without
    a global sort."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])
    day_us = 86400 * US

    def sharded(t: pa.Table) -> pa.Table:
        day = pc.divide(pa.array(np.asarray(column_ts_us(t["ts"]))),
                        pa.scalar(day_us, pa.int64()))
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        # block-local dedupe shrinks the shuffle before it happens
        return (pa.table({"user_id": t["user_id"], "day": day,
                          "_shard": shard})
                .group_by(["user_id", "day", "_shard"]).aggregate([]))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"])
        u = g["user_id"].to_numpy(np.int64)
        d = g["day"].to_numpy(np.int64)
        if len(u) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "max_streak": pd.Series([], dtype=np.int64)})
        brk = np.ones(len(u), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] != 1)
        starts = np.flatnonzero(brk)
        lengths = np.diff(np.append(starts, len(u)))
        isl = pd.DataFrame({"user_id": u[starts], "len": lengths})
        out = isl.groupby("user_id", sort=False)["len"].max().reset_index()
        return out.rename(columns={"len": "max_streak"})

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    out["user_id"] = out["user_id"].astype("int64")
    out["max_streak"] = out["max_streak"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def benford_totalprice(sf_dir: str) -> pd.DataFrame:
    """First-significant-digit profile (Benford's-law audit): the digit
    extracts with a vectorized repeated integer divide over cents (≤10
    passes, no string round-trip), per-block counts fold to 9 rows per
    block, and the fraction divides two exact ints on the 9-row frame."""
    ds = _t(sf_dir, "orders", ["o_totalprice"])

    _schema = pa.schema([("digit", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        c = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        while True:
            big = c >= 10
            if not big.any():
                break
            c[big] //= 10
        return (pa.table({"digit": pa.array(c)}).group_by("digit")
                .aggregate([([], "count_all")])
                .rename_columns(["digit", "n"]).cast(_schema))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("digit").aggregate(Sum("n", alias_name="n"))
           .to_pandas()).sort_values("digit").reset_index(drop=True)
    n = out["n"].to_numpy(np.int64)
    out["n"] = n
    out["frac_ppm"] = _ppm(n, np.full(len(n), n.sum(), dtype=np.int64))
    out["digit"] = out["digit"].astype("int64")
    return out[["digit", "n", "frac_ppm"]]


def geomean_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Grouped geometric mean via the log-sum identity exp(avg(ln x)):
    each element's ln quantizes to an exact 1e-9-unit int64 BEFORE the
    shuffle (a float partial sum would be arrival-order dependent — the
    determinism contract every sibling op keeps), so the alphabet-sized
    reduce is order-free bit-exact; both engines round the SAME libm
    double per element, and the 1e-9 per-element quantization is ~5
    orders inside the final 6-decimal round. Positivity is pushed into
    the parquet scan as a row filter."""
    ds = _t(sf_dir, "events", ["event_type", "value"],
            flt=(pc.field("value") > 0))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["value"], 0.0))
        ln_q = pc.cast(pc.round(pc.multiply(pc.ln(t["value"]), 1e9)),
                       pa.int64())
        return (pa.table({"event_type": t["event_type"], "ln_q": ln_q})
                .group_by("event_type")
                .aggregate([("ln_q", "sum"), ([], "count_all")])
                .rename_columns(["event_type", "sl", "n"]))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("sl", alias_name="sl"), Sum("n", alias_name="n"))
           .to_pandas())
    out["geomean6"] = np.round(
        np.exp(out["sl"].to_numpy(np.float64) / 1e9
               / out["n"].to_numpy(np.float64)), 6)
    out["n"] = out["n"].astype("int64")
    return (out.drop(columns=["sl"]).sort_values("event_type")
            .reset_index(drop=True)[["event_type", "n", "geomean6"]])


_PROFILE_COLS = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]


def profile_lineitem(sf_dir: str) -> pd.DataFrame:
    """Dataset profiler (per-column nulls / exact NDV / min / max): two
    deliberately separate pruned scans — a value-sharded NDV
    co-partition whose first level dedupes block-locally so the shuffle
    carries distincts not rows, and a constant-size min/max/null partial
    per block merged on the driver. Re-scanning beats a mid-pipeline
    materialize() at corpus scale (the 4-column projection would pin
    TBs in the object store). The profile frame is 4 rows."""
    ds = _t(sf_dir, "lineitem", _PROFILE_COLS)

    def distincts(t: pa.Table) -> pa.Table:
        frames = []
        for c in _PROFILE_COLS:
            # drop_null first: SQL's COUNT(DISTINCT) ignores NULLs, and a
            # null->NaN numpy round-trip would count them as one value
            v = np.unique(t[c].drop_null().to_numpy(zero_copy_only=False))
            # shard by value bits: distinct values partition cleanly, so
            # each shard's unique-count is final — one fixed-fanout
            # shuffle of block-deduped pairs replaces the (col, value)-
            # domain groupby + second reduce
            shard = v.view(np.int64) & np.int64(63)
            frames.append(pa.table({"col": pa.array([c] * len(v)),
                                    "v": pa.array(v),
                                    "_shard": pa.array(shard)}))
        return pa.concat_tables(frames)

    def shard_ndv(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["col", "v"])
        return (d.groupby("col", sort=False).size()
                .reset_index(name="ndv"))

    ndv = (ds.map_batches(distincts, batch_format="pyarrow")
           .groupby("_shard").map_groups(shard_ndv, batch_format="pandas")
           .to_pandas()
           .groupby("col", sort=True)["ndv"].sum().reset_index())

    def stat_partial(t: pa.Table) -> pa.Table:
        rows = {"col": [], "nulls": [], "min_v": [], "max_v": []}
        for c in _PROFILE_COLS:
            col = t[c]
            rows["col"].append(c)
            rows["nulls"].append(col.null_count)
            v = col.drop_null().to_numpy(zero_copy_only=False)
            rows["min_v"].append(float(v.min()) if len(v) else np.nan)
            rows["max_v"].append(float(v.max()) if len(v) else np.nan)
        return pa.table(rows)

    stats = (ds.map_batches(stat_partial, batch_format="pyarrow")
             .to_pandas()
             .groupby("col", sort=True)
             .agg(nulls=("nulls", "sum"), min_v=("min_v", "min"),
                  max_v=("max_v", "max")).reset_index())
    out = stats.merge(ndv, on="col")
    out["nulls"] = out["nulls"].astype("int64")
    out["ndv"] = out["ndv"].astype("int64")
    return (out.sort_values("col").reset_index(drop=True)
            [["col", "nulls", "ndv", "min_v", "max_v"]])


def spearman_value_hour_by_type(sf_dir: str) -> pd.DataFrame:
    """Spearman rank correlation (value vs hour-of-day per event type):
    average ranks from pandas' C ranker inside one map_groups per type,
    Pearson on the ranks from numpy moment sums. Assumes a type's rows
    fit one worker (same contract as every rank/percentile stage); the
    100-TB rewrite derives average ranks from the (type, cents) and
    (type, hour) count histograms instead of row-level ranks."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        hr = (np.asarray(column_ts_us(t["ts"])) // HOUR_US) % 24
        return pa.table({"event_type": t["event_type"], "cents": cents,
                         "hr": pa.array(hr)})

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        # ranks are value-determined, but the float cov/var sums below
        # follow row order — pin it so the statistic is bit-identical
        # on any block arrival order
        g = g.sort_values(["cents", "hr"], kind="mergesort")
        rv = g["cents"].rank(method="average").to_numpy(np.float64)
        rh = g["hr"].rank(method="average").to_numpy(np.float64)
        n = len(g)
        mv, mh = rv.mean(), rh.mean()
        cov = ((rv - mv) * (rh - mh)).sum()
        den = np.sqrt(((rv - mv) ** 2).sum() * ((rh - mh) ** 2).sum())
        rho = cov / den if den > 0 else np.nan
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "n": np.array([n], dtype=np.int64),
                             "spearman6": [np.round(rho, 6)]})

    out = (ds.map_batches(keyed, batch_format="pyarrow")
           .groupby("event_type").map_groups(per_type, batch_format="pandas")
           .to_pandas())
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def welch_ttest_events(sf_dir: str) -> pd.DataFrame:
    """One-vs-rest Welch t-test per event type (A/B-style lift check):
    integer-cent moment partials fold per block, the complement's
    moments subtract from the grand totals on the alphabet-sized frame,
    and the float formula runs once per group with the same expression
    shape as the oracle — deterministic to the last bit before round."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = np.round(t["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        return (pa.table({"event_type": t["event_type"], "sx": pa.array(c),
                          "sxx": pa.array(c * c)})
                .group_by("event_type")
                .aggregate([("sx", "sum"), ("sxx", "sum"), ([], "count_all")])
                .rename_columns(["event_type", "sx", "sxx", "n"]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("sx", alias_name="sx"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("n", alias_name="n"))
           .to_pandas()).sort_values("event_type").reset_index(drop=True)
    # complements subtract in EXACT int64 first (the oracle's BIGINT
    # arithmetic), then cast: a float-first subtraction would diverge
    # once sum-of-squares passes 2^53
    n1i = agg["n"].to_numpy(np.int64)
    sx1i = agg["sx"].to_numpy(np.int64)
    sxx1i = agg["sxx"].to_numpy(np.int64)
    n1 = n1i.astype(np.float64)
    sx1 = sx1i.astype(np.float64)
    sxx1 = sxx1i.astype(np.float64)
    n2 = (n1i.sum() - n1i).astype(np.float64)
    sx2 = (sx1i.sum() - sx1i).astype(np.float64)
    sxx2 = (sxx1i.sum() - sxx1i).astype(np.float64)
    m1, m2 = sx1 / n1, sx2 / n2
    v1 = (sxx1 - sx1 * sx1 / n1) / (n1 - 1.0)
    v2 = (sxx2 - sx2 * sx2 / n2) / (n2 - 1.0)
    t_stat = (m1 - m2) / np.sqrt(v1 / n1 + v2 / n2)
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "n": agg["n"].astype("int64"),
        "mean_diff6": np.round((m1 - m2) / 100.0, 6),
        "t6": np.round(t_stat, 6),
    })


def markov_transitions_events(sf_dir: str) -> pd.DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: consecutive (from, to) type pairs count locally inside 32
    user shards (one sort per shard, boundary-masked vectorized shift —
    never a per-user loop), and the probability row-normalizes on the
    alphabet²-sized reduced frame."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy()
        if len(t) < 2:
            return pd.DataFrame({"from_type": pd.Series([], dtype=str),
                                 "to_type": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        same = u[:-1] == u[1:]
        pairs = pd.DataFrame({"from_type": t[:-1][same],
                              "to_type": t[1:][same]})
        out = (pairs.groupby(["from_type", "to_type"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype(np.int64)
        return out

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas()
           .groupby(["from_type", "to_type"], sort=True)["n"]
           .sum().reset_index())
    row_tot = out.groupby("from_type")["n"].transform("sum")
    out["prob_ppm"] = _ppm(out["n"].to_numpy(np.int64),
                           row_tot.to_numpy(np.int64))
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def cooccurrence_pairs_events(sf_dir: str) -> pd.DataFrame:
    """Market-basket co-occurrence mining: distinct event-type pairs
    seen together in one (user, day) basket. Triples dedupe block-
    locally BEFORE the user-shard shuffle; each shard self-merges its
    tiny per-basket type sets in C (alphabet-bounded fan-out) and
    pre-counts, so the global reduce is alphabet²-sized."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    day_us = 86400 * US

    def sharded(t: pa.Table) -> pa.Table:
        day = pc.divide(pa.array(np.asarray(column_ts_us(t["ts"]))),
                        pa.scalar(day_us, pa.int64()))
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return (pa.table({"user_id": t["user_id"], "day": day,
                          "event_type": t["event_type"], "_shard": shard})
                .group_by(["user_id", "day", "event_type", "_shard"])
                .aggregate([]))

    pairs, _ = _pairs_in_shards(
        ds.map_batches(sharded, batch_format="pyarrow"),
        ["user_id", "day"], "event_type")
    out = pairs.rename(columns={"event_type_a": "type_a",
                                "event_type_b": "type_b"})
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def ttr_by_source(sf_dir: str) -> pd.DataFrame:
    """Lexical diversity per source (type-token ratio): token totals
    ride constant-size per-block partials; the vocabulary size reuses
    the profiler's shape — block-local unique (source, word) pairs, one
    distinct-pair groupby, then a per-source count. Two pruned scans by
    design (a materialize() would pin the text column in the object
    store); the division runs once on the sources-sized frame."""
    ds = _t(sf_dir, "documents", ["source", "text"])

    def words_of(t: pa.Table) -> tuple[pa.Array, pa.Array]:
        toks = pc.utf8_split_whitespace(t.column("text").combine_chunks())
        w = pc.list_flatten(toks)
        src = pc.take(t.column("source"), pc.list_parent_indices(toks))
        mask = pc.not_equal(w, "")
        return pc.filter(src, mask), pc.filter(w, mask)

    def tok_counts(t: pa.Table) -> pa.Table:
        src, _w = words_of(t)
        return (pa.table({"source": src}).group_by("source")
                .aggregate([([], "count_all")])
                .rename_columns(["source", "n_tokens"]))

    def distinct_pairs(t: pa.Table) -> pa.Table:
        src, w = words_of(t)
        return (pa.table({"source": src, "w": w})
                .group_by(["source", "w"]).aggregate([]))

    totals = (ds.map_batches(tok_counts, batch_format="pyarrow")
              .groupby("source").aggregate(Sum("n_tokens",
                                               alias_name="n_tokens"))
              .to_pandas())
    types = (ds.map_batches(distinct_pairs, batch_format="pyarrow")
             .groupby(["source", "w"]).aggregate(Count(alias_name="_c"))
             .map_batches(lambda t: t.group_by("source").aggregate(
                 [([], "count_all")]).rename_columns(["source", "n_types"]),
                 batch_format="pyarrow")
             .groupby("source").aggregate(Sum("n_types",
                                              alias_name="n_types"))
             .to_pandas())
    out = totals.merge(types, on="source")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["n_types"] = out["n_types"].astype("int64")
    out["ttr_ppm"] = _ppm(out["n_types"].to_numpy(np.int64),
                          out["n_tokens"].to_numpy(np.int64))
    return (out.sort_values("source").reset_index(drop=True)
            [["source", "n_tokens", "n_types", "ttr_ppm"]])


def gini_totalprice(sf_dir: str) -> pd.DataFrame:
    """Gini concentration coefficient of order value — the classic
    rank-weighted formula G = 2·Σ rank·x / (n·Σx) − (n+1)/n needs a
    global value sort, which rewrites exactly over the (cents, count)
    distinct-value frame: a tied run occupying ranks r+1..r+c
    contributes v·(c·r + c(c+1)/2) regardless of intra-tie order. The
    frame is value-domain-bounded; the rank-weighted sum is bounded by
    n·Σcents, which passes int64 around TPC-H sf1, so it accumulates in
    arbitrary-precision Python ints on the reduced frame (matching the
    oracle's HUGEINT sum) and only the final three-term float
    expression leaves integers."""
    ds = _t(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"cents": cents}).group_by("cents")
                .aggregate([([], "count_all")])
                .rename_columns(["cents", "cnt"]))

    freq = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("cents").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()).sort_values("cents").reset_index(drop=True)
    v = freq["cents"].astype(object).to_numpy()
    c = freq["cnt"].astype(object).to_numpy()
    cum = np.cumsum(c)
    r = np.concatenate(([0], cum[:-1]))  # ranks before each run
    s_rank = int((v * (c * r + c * (c + 1) // 2)).sum())
    n = int(cum[-1])
    total = int((v * c).sum())
    gini6 = np.round(2.0 * float(s_rank) / float(n * total)
                     - (n + 1.0) / n, 6)
    return pd.DataFrame({"n": np.array([n], dtype=np.int64),
                         "gini6": [gini6]})


def orders_without_lineitem(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity audit with BOTH sides large (the
    broadcast-anti-join's big sibling, cf. ``non_customer_events``):
    lineitem's keys dedupe block-locally, one distinct-key groupby
    bounds the right side, then a partitioned hash left-outer join +
    null filter yields the orphans — no key set ever collects on the
    driver."""
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    li = _t(sf_dir, "lineitem", ["l_orderkey"])

    def distinct_keys(t: pa.Table) -> pa.Table:
        return (pa.table({"o_orderkey": t["l_orderkey"]})
                .group_by("o_orderkey").aggregate([([], "count_all")])
                .rename_columns(["o_orderkey", "_m"]))

    keys = (li.map_batches(distinct_keys, batch_format="pyarrow")
            .groupby("o_orderkey").aggregate(Sum("_m", alias_name="_m")))
    buckets = join_buckets(_tbytes(sf_dir, "orders", "lineitem"))
    joined = hash_join(orders, keys, on="o_orderkey", how="left",
                       buckets=buckets)
    out = (joined.map_batches(lambda t: t.filter(pc.is_null(t["_m"])),
                              batch_format="pyarrow")
           .to_pandas())
    if out.empty:  # zero orphans: Ray drops the schema with the rows
        return pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                             "o_totalprice": pd.Series([], dtype="float64")})
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    return (out.drop(columns=["_m"]).sort_values("o_orderkey")
            .reset_index(drop=True)[["o_orderkey", "o_totalprice"]])


def lineitems_per_order_histogram(sf_dir: str) -> pd.DataFrame:
    """Group-size distribution (how many orders have k lineitems): a
    nested aggregation — the wide orderkey groupby reduces via per-block
    partial counts, then the histogram of group sizes is a second
    per-block partial over the already-reduced frame, so the final
    shuffle carries at most max-k rows per block."""
    ds = _t(sf_dir, "lineitem", ["l_orderkey"])

    def partial(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["l_orderkey"],
                                        pa.scalar(63, pa.int64())), pa.int64())
        return (t.append_column("_shard", shard)
                .group_by(["l_orderkey", "_shard"])
                .aggregate([([], "count_all")])
                .rename_columns(["l_orderkey", "_shard", "n"]))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        # orders co-locate per shard, so group sizes finish here and the
        # shard emits its ≤max-k histogram — ONE fixed-fanout shuffle
        # instead of an orderkey-domain groupby + a second reduce
        sizes = g.groupby("l_orderkey", sort=False)["n"].sum()
        out = sizes.value_counts().reset_index()
        out.columns = ["n_items", "n_orders"]
        return out

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas()
           .groupby("n_items", sort=True)["n_orders"].sum().reset_index())
    for c in ("n_items", "n_orders"):
        out[c] = out[c].astype("int64")
    return out.sort_values("n_items").reset_index(drop=True)


def rolling_stats_daily(sf_dir: str, w: int = 3) -> pd.DataFrame:
    """Bollinger-style rolling mean/std over the daily value series per
    event type (ROWS w-1 PRECEDING): the corpus reduces to a
    (types × days) integer-cent frame first; the window runs on that
    reduced series with explicit moment formulas (int window sums, one
    float pass) so the doubles match the oracle bit-for-bit."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])
    day_us = 86400 * US

    def partial(t: pa.Table) -> pa.Table:
        day = pc.multiply(pc.divide(pa.array(np.asarray(column_ts_us(t["ts"]))),
                                    pa.scalar(day_us, pa.int64())),
                          pa.scalar(day_us, pa.int64()))
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return (pa.table({"event_type": t["event_type"], "day": day,
                          "cents": cents})
                .group_by(["event_type", "day"])
                .aggregate([("cents", "sum")])
                .rename_columns(["event_type", "day", "cents"]))

    daily = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["event_type", "day"])
             .aggregate(Sum("cents", alias_name="cents"))
             .to_pandas()).sort_values(["event_type", "day"])
    frames = []
    for et, g in daily.groupby("event_type", sort=True):
        c = g["cents"].to_numpy(np.int64)
        s = pd.Series(c)
        n = s.rolling(w, min_periods=1).count().to_numpy(np.float64)
        sm = s.rolling(w, min_periods=1).sum().to_numpy(np.float64)
        sq = pd.Series(c * c).rolling(w, min_periods=1).sum().to_numpy(
            np.float64)
        mean = sm / n
        var = np.where(n > 1, (sq - sm * sm / n) / (n - 1.0), np.nan)
        frames.append(pd.DataFrame({
            "event_type": et,
            "day": us_to_timestamp_array(g["day"].to_numpy(np.int64)),
            "daily_value": c.astype(np.float64) / 100.0,
            "roll_mean6": np.round(mean / 100.0, 6),
            "roll_std6": np.round(np.sqrt(var) / 100.0, 6),
        }))
    return pd.concat(frames, ignore_index=True)


def audience_jaccard_types(sf_dir: str) -> pd.DataFrame:
    """Audience-overlap (set-similarity) matrix between event types:
    Jaccard of user sets for every type pair. Distinct (user, type)
    pairs dedupe block-locally, one user co-partition self-merges the
    alphabet-bounded per-user type sets, and the division runs on the
    alphabet²-sized frame against exact per-type audience counts."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return (pa.table({"user_id": t["user_id"],
                          "event_type": t["event_type"], "_shard": shard})
                .group_by(["user_id", "event_type", "_shard"])
                .aggregate([]))

    pairs, sizes = _pairs_in_shards(
        ds.map_batches(sharded, batch_format="pyarrow"),
        ["user_id"], "event_type", with_sizes=True)
    out = pairs.rename(columns={"event_type_a": "type_a",
                                "event_type_b": "type_b",
                                "n": "inter"})
    na = out["type_a"].map(sizes).to_numpy(np.int64)
    nb = out["type_b"].map(sizes).to_numpy(np.int64)
    inter = out["inter"].to_numpy(np.int64)
    out["inter"] = inter
    out["jaccard_ppm"] = _ppm(inter, na + nb - inter)
    return (out.sort_values(["type_a", "type_b"])
            .reset_index(drop=True)[["type_a", "type_b", "inter",
                                     "jaccard_ppm"]])


def _fulfillment_lag_hist(sf_dir: str) -> pd.DataFrame:
    """Shared engine for the two fulfillment-lag views: ONE orderkey
    co-partition replaces the old per-order Min groupby (an
    orderkey-domain group count priced that shuffle) plus the second
    hash-join exchange. Both sides reduce per block first (lineitem to
    per-block min ship DAYS — floor is monotone, so min commutes with
    the day quantization), union under one typed Arrow schema, and a
    shards-sized groupby co-locates each order's rows; inside the shard
    a vectorized group-min + merge yields whole-day lags that collapse
    to a (priority, days) histogram before leaving the task. The driver
    only ever sees shards x |priorities x days| rows, and both the mean
    and the quantile views read off that one tiny frame."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                   "o_orderpriority"])
    day_us = 86400 * US
    shards = join_buckets(_tbytes(sf_dir, "orders", "lineitem"))

    def li_partial(t: pa.Table) -> pa.Table:
        sd = pa.array(np.asarray(column_ts_us(t["l_shipdate"])) // day_us)
        g = (pa.table({"o_orderkey": t["l_orderkey"], "ship_days": sd})
             .group_by("o_orderkey").aggregate([("ship_days", "min")])
             .rename_columns(["o_orderkey", "ship_days"]))
        out = pa.table({
            "o_orderkey": g["o_orderkey"],
            "ship_days": g["ship_days"],
            "od_days": pa.nulls(len(g), pa.int64()),
            "o_orderpriority": pa.nulls(len(g), pa.string())})
        return add_shard_column(out, "o_orderkey", shards)

    def o_partial(t: pa.Table) -> pa.Table:
        od = pa.array(np.asarray(column_ts_us(t["o_orderdate"])) // day_us)
        out = pa.table({
            "o_orderkey": t["o_orderkey"],
            "ship_days": pa.nulls(len(t), pa.int64()),
            "od_days": od,
            "o_orderpriority": t["o_orderpriority"]})
        return add_shard_column(out, "o_orderkey", shards)

    u = (li.map_batches(li_partial, batch_format="pyarrow")
         .union(orders.map_batches(o_partial, batch_format="pyarrow")))

    def shard_hist(g: pd.DataFrame) -> pd.DataFrame:
        # day counts are ~1e4, far inside float53 — the pandas
        # null-to-float widening of the absent side's ints is safe here
        li_rows = g[g["ship_days"].notna()]
        o_rows = g[g["od_days"].notna()]
        first = (li_rows.groupby("o_orderkey", sort=False)["ship_days"]
                 .min().reset_index())
        m = o_rows[["o_orderkey", "od_days", "o_orderpriority"]].merge(
            first, on="o_orderkey", how="inner")
        if not len(m):
            return pd.DataFrame(
                {"o_orderpriority": pd.Series([], dtype=object),
                 "days": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")})
        days = (m["ship_days"].to_numpy(np.int64)
                - m["od_days"].to_numpy(np.int64))
        return (pd.DataFrame({"o_orderpriority": m["o_orderpriority"],
                              "days": days})
                .groupby(["o_orderpriority", "days"], sort=False)
                .size().rename("n").reset_index())

    return (u.groupby("_shard")
            .map_groups(shard_hist, batch_format="pandas")
            .to_pandas()
            .groupby(["o_orderpriority", "days"], as_index=False)["n"]
            .sum())


def fulfillment_lag_by_priority(sf_dir: str) -> pd.DataFrame:
    """Order-to-first-ship lag per priority: reads the shared
    co-partitioned lag histogram (`_fulfillment_lag_hist`) and takes
    the exact integer mean per priority off that priorities x days
    frame — no join or orderkey-domain groupby of its own."""
    hist = _fulfillment_lag_hist(sf_dir)
    hist = hist.assign(
        sum_days=hist["days"].to_numpy(np.int64)
        * hist["n"].to_numpy(np.int64))
    out = (hist.groupby("o_orderpriority", as_index=False)
           .agg(n=("n", "sum"), sum_days=("sum_days", "sum")))
    out["avg_days_ppm"] = _ppm(out["sum_days"].to_numpy(np.int64),
                               out["n"].to_numpy(np.int64))
    out["n"] = out["n"].astype("int64")
    return (out.drop(columns=["sum_days"])
            .sort_values("o_orderpriority").reset_index(drop=True)
            [["o_orderpriority", "n", "avg_days_ppm"]])


def hhi_supplier_concentration(sf_dir: str) -> pd.DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per part: the
    (part, supplier) quantity matrix reduces with integer-cent partials,
    per-part totals come from a transform on that reduced frame, and the
    squared-share sum is one vectorized pass — output is parts-sized,
    top-20 most concentrated multi-supplier parts by key order."""
    ds = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0)), pa.int64())
        return (pa.table({"l_partkey": t["l_partkey"],
                          "l_suppkey": t["l_suppkey"], "q": q})
                .group_by(["l_partkey", "l_suppkey"])
                .aggregate([("q", "sum")])
                .rename_columns(["l_partkey", "l_suppkey", "q"]))

    # the (part, supplier) pair domain is near rows-sized, so a Ray
    # all-to-all groupby over it cost 6+ s at sf0.1 (group count prices
    # the shuffle — the `top_parts_in_top_nations` lesson). Instead ONE
    # partkey co-partition into 32 fixed shards: every row of a part
    # lands in one shard, so the pair sums, the per-part total AND the
    # whole HHI finish inside the shard task; only parts-sized result
    # rows reach the driver.
    def shard_hhi(g: pd.DataFrame) -> pd.DataFrame:
        ps = (g.groupby(["l_partkey", "l_suppkey"], sort=False,
                        as_index=False)["q"].sum())
        q = ps["q"].to_numpy(np.int64)
        ps["qq"] = q * q
        out = (ps.groupby("l_partkey", sort=False)
               .agg(n_suppliers=("l_suppkey", "nunique"),
                    s2=("qq", "sum"), tq=("q", "sum"))
               .reset_index())
        out = out[out["n_suppliers"] > 1]
        if not len(out):
            return pd.DataFrame(
                {"l_partkey": pd.Series([], dtype="int64"),
                 "n_suppliers": pd.Series([], dtype="int64"),
                 "hhi_ppm": pd.Series([], dtype="int64")})
        # HHI = Σ(q/tq)² = Σq²/tq² is an exact rational of integer-cent
        # sums, so it DOES hit .5 decimal boundaries (numpy half-even vs
        # DuckDB half-away flipped two fixture rows at round6). Emit
        # exact integer parts-per-million instead: half-up integer
        # division on arbitrary-precision ints, no float anywhere.
        s2 = out["s2"].astype(object)
        tq = out["tq"].astype(object)
        ppm = (2 * s2 * 1_000_000 + tq * tq) // (2 * tq * tq)
        out["hhi_ppm"] = ppm.astype("int64")
        out["n_suppliers"] = out["n_suppliers"].astype("int64")
        out["l_partkey"] = out["l_partkey"].astype("int64")
        return out[["l_partkey", "n_suppliers", "hhi_ppm"]]

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .map_batches(lambda t: add_shard_column(t, "l_partkey", 32),
                        batch_format="pyarrow")
           .groupby("_shard").map_groups(shard_hhi, batch_format="pandas")
           .to_pandas())
    return (out.sort_values("l_partkey").reset_index(drop=True)
            [["l_partkey", "n_suppliers", "hhi_ppm"]])


def weighted_median_price(sf_dir: str) -> pd.DataFrame:
    """Quantity-weighted median price per return flag — the weighted
    sibling of ``median_value_by_type``, EXACT in two bounded streaming
    passes. The price domain is near rows-sized (extendedprice =
    quantity x part price), so a distinct-cents groupby would shuffle
    ~every row (measured 8-9 s at sf0.1); instead pass 1 reduces to a
    fixed-width $100-bucket weight histogram (``cents // 10^4`` bounds
    the bucket domain with no min/max pre-pass; blocks x buckets
    partials merge on the driver), the driver walks the cumulative to
    find each flag's median BUCKET, and pass 2 re-scans only rows
    inside those buckets (a flags-sized broadcast predicate) for the
    exact within-bucket rule — smallest cents with 2·cumw ≥ total,
    pure integer comparisons, nothing ever sorts the corpus."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_extendedprice", "l_quantity"])
    BUCKET = 10_000  # cents per bucket ($100)

    def pass1(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
        w = pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0)), pa.int64())
        b = pc.divide(cents, pa.scalar(BUCKET, pa.int64()))
        return (pa.table({"l_returnflag": t["l_returnflag"], "b": b,
                          "w": w})
                .group_by(["l_returnflag", "b"]).aggregate([("w", "sum")])
                .rename_columns(["l_returnflag", "b", "w"]))

    hist = (ds.map_batches(pass1, batch_format="pyarrow").to_pandas()
            .groupby(["l_returnflag", "b"], as_index=False)["w"].sum()
            .sort_values(["l_returnflag", "b"]))
    targets: dict[str, tuple[int, int, int]] = {}  # flag -> (bucket,
    for flag, g in hist.groupby("l_returnflag", sort=True):   # prev_cum,
        w = g["w"].to_numpy(np.int64)                         # total)
        cum = np.cumsum(w)
        total = int(cum[-1])
        idx = int(np.searchsorted(2 * cum, total))
        targets[flag] = (int(g["b"].to_numpy(np.int64)[idx]),
                         int(cum[idx - 1]) if idx else 0, total)
    targets_ref = ray.put(targets)

    def pass2(t: pa.Table) -> pa.Table:
        tg = broadcast_get(targets_ref)
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64()).to_numpy()
        w = pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0)),
                    pa.int64()).to_numpy()
        flags = t["l_returnflag"].to_numpy(zero_copy_only=False)
        want = (pd.Series(flags)
                .map({f: v[0] for f, v in tg.items()})
                .to_numpy(np.int64))
        keep = (cents // BUCKET) == want
        if not keep.any():
            return pa.table({"l_returnflag": pa.array([], pa.string()),
                             "cents": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        df = (pd.DataFrame({"l_returnflag": flags[keep],
                            "cents": cents[keep], "w": w[keep]})
              .groupby(["l_returnflag", "cents"], as_index=False)["w"]
              .sum())
        return pa.Table.from_pandas(df, preserve_index=False)

    inb = (ds.map_batches(pass2, batch_format="pyarrow").to_pandas()
           .groupby(["l_returnflag", "cents"], as_index=False)["w"].sum()
           .sort_values(["l_returnflag", "cents"]))
    rows = []
    for flag, g in inb.groupby("l_returnflag", sort=True):
        _, prev, total = targets[flag]
        cum = prev + np.cumsum(g["w"].to_numpy(np.int64))
        idx = int(np.searchsorted(2 * cum, total))
        rows.append((flag, g["cents"].to_numpy(np.int64)[idx] / 100.0))
    return pd.DataFrame(rows, columns=["l_returnflag", "wmedian"])


def copurchase_part_pairs(sf_dir: str) -> pd.DataFrame:
    """Co-purchase graph construction (parts appearing in one order
    together, edge weight = co-order count, support ≥ 2): the
    large-domain sibling of ``cooccurrence_pairs_events`` — pair fan-out
    is bounded by per-order basket size (k(k−1)/2 per order), pairs
    pre-count inside 64 order shards, and the support filter prunes the
    edge list before it leaves the final reduce."""
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["l_orderkey"],
                                        pa.scalar(63, pa.int64())), pa.int64())
        return (pa.table({"l_orderkey": t["l_orderkey"],
                          "l_partkey": t["l_partkey"], "_shard": shard})
                .group_by(["l_orderkey", "l_partkey", "_shard"])
                .aggregate([]))

    pairs, _ = _pairs_in_shards(
        ds.map_batches(sharded, batch_format="pyarrow"),
        ["l_orderkey"], "l_partkey")
    out = pairs.rename(columns={"l_partkey_a": "part_a",
                                "l_partkey_b": "part_b"})
    out = out[out["n"] >= 2]
    for c in ("part_a", "part_b", "n"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def assoc_rules_copurchase(sf_dir: str) -> pd.DataFrame:
    """Market-basket association rules (Agrawal-style apriori readout at
    itemset size 2) over order baskets: every DIRECTED rule a -> b with
    pair support >= 2, scored support = n_ab/N, confidence = n_ab/n_a
    and lift = n_ab*N/(n_a*n_b) — all exact half-away ppm from integer
    counts, so the oracle hash-matches. Reuses the sharded pair-mining
    kernel (`_pairs_in_shards` with item sizes + basket total riding
    the same pass as sentinel rows); the rule table is pairs-domain
    sized, never basket-domain."""
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["l_orderkey"],
                                        pa.scalar(63, pa.int64())),
                        pa.int64())
        return (pa.table({
            "l_orderkey": t["l_orderkey"],
            # string items: the kernel's size/total sentinels use ""
            "part": pc.cast(t["l_partkey"], pa.string()),
            "_shard": shard,
        }).group_by(["l_orderkey", "part", "_shard"]).aggregate([]))

    pairs, sizes, n_orders = _pairs_in_shards(
        ds.map_batches(sharded, batch_format="pyarrow"),
        ["l_orderkey"], "part", with_sizes=True, with_basket_count=True)
    pairs = pairs[pairs["n"] >= 2]
    rows = []
    for a, b, n_ab in pairs.itertuples(index=False):
        for x, y in ((a, b), (b, a)):
            rows.append((int(x), int(y), int(n_ab), int(sizes[x]),
                         int(sizes[y])))
    out = pd.DataFrame(rows, columns=["antecedent", "consequent",
                                      "n_pair", "n_ante", "n_cons"])
    out["support_ppm"] = _ppm(out["n_pair"].to_numpy(np.int64),
                              np.full(len(out), n_orders, np.int64))
    out["confidence_ppm"] = _ppm(out["n_pair"].to_numpy(np.int64),
                                 out["n_ante"].to_numpy(np.int64))
    out["lift_ppm"] = _ppm(
        out["n_pair"].to_numpy(object) * n_orders,
        out["n_ante"].to_numpy(object) * out["n_cons"].to_numpy(object))
    out = out.drop(columns=["n_cons"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return (out.sort_values(["antecedent", "consequent"])
            .reset_index(drop=True))


def session_conversion_rate(sf_dir: str, gap_s: int = 7200) -> pd.DataFrame:
    """Sessionized funnel conversion (per entry event type: how many
    sessions convert to a purchase): composes the clickstream
    sessionizer with per-session first/any aggregates — one user
    co-partition, vectorized gap-cumsum session ids, first-row entry
    types and purchase flags via numpy reductions over island starts;
    the rate divides on the alphabet-sized frame."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    gap_us = gap_s * US

    def per_user_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        ts_us = series_ts_us(g["ts"]).to_numpy()
        et = g["event_type"].to_numpy()
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (np.diff(ts_us) > gap_us)
        sid = np.cumsum(brk) - 1  # 0-based session index
        entry = et[brk]  # first event of each session
        has_p = np.zeros(sid[-1] + 1 if len(sid) else 0, dtype=np.int64)
        np.maximum.at(has_p, sid, (et == "purchase").astype(np.int64))
        return (pd.DataFrame({"entry_type": entry, "converted": has_p})
                .groupby("entry_type", sort=False)
                .agg(n_sessions=("converted", "size"),
                     n_converted=("converted", "sum")).reset_index())

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard")
           .map_groups(per_user_group, batch_format="pandas")
           .to_pandas()
           .groupby("entry_type", sort=True)
           .agg(n_sessions=("n_sessions", "sum"),
                n_converted=("n_converted", "sum")).reset_index())
    out["rate_ppm"] = _ppm(out["n_converted"].to_numpy(np.int64),
                           out["n_sessions"].to_numpy(np.int64))
    for c in ("n_sessions", "n_converted"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def pca_embeddings(sf_dir: str, k: int = 2) -> pd.DataFrame:
    """Distributed PCA (rows-only: the eigensolve is not ANSI SQL):
    exact int64 moment partials -> O(dim²) reduce -> driver eigensolve,
    then a pure-map projection. Output is block-layout-invariant because
    the covariance matrix is bit-identical on any split (see
    ``stages/pca.py``); pinned by ``test_pca.py`` (orthonormality,
    variance conservation, layout invariance, reconstruction ordering)."""
    from ..stages.pca import pca_fit, pca_project

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    model = pca_fit(ds, k)
    out = pca_project(ds, model).to_pandas()
    for i in range(k):
        c = f"pc{i + 1}"
        # e6-quantized units back to input units, 6-decimal pin
        out[c] = np.round(out[c].to_numpy(np.float64) / 1e6, 6)
    return out.sort_values("vec_id").reset_index(drop=True)


def rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    terciles): one custkey reduce builds the per-customer metric frame,
    three value-domain-bounded histograms yield exact inverse-CDF
    tercile thresholds (min v with 3·cum ≥ i·n — the
    ``weighted_median_price`` rule), bucket assignment is a pure
    vectorized map over the reduced frame, and the output is the ≤27-
    cell segment count matrix."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    day_us = 86400 * US

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(pa.array(np.asarray(column_ts_us(t["o_orderdate"]))),
                        pa.scalar(day_us, pa.int64()))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"o_custkey": t["o_custkey"], "day": day,
                          "cents": cents})
                .group_by("o_custkey")
                .aggregate([("day", "max"), ("cents", "sum"),
                            ([], "count_all")])
                .rename_columns(["o_custkey", "last_day", "money", "freq"]))

    cust = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("o_custkey")
            .aggregate(Max("last_day", alias_name="last_day"),
                       Sum("money", alias_name="money"),
                       Sum("freq", alias_name="freq"))
            .to_pandas())  # customers-sized reduced frame

    def terciles(v: np.ndarray) -> tuple[int, int]:
        vals, cnts = np.unique(v, return_counts=True)
        cum = np.cumsum(cnts)
        n = cum[-1]
        t1 = vals[int(np.searchsorted(3 * cum, n))]
        t2 = vals[int(np.searchsorted(3 * cum, 2 * n))]
        return int(t1), int(t2)

    out_cols = {}
    for col, name in (("last_day", "r_bucket"), ("freq", "f_bucket"),
                      ("money", "m_bucket")):
        v = cust[col].to_numpy(np.int64)
        t1, t2 = terciles(v)
        out_cols[name] = 1 + (v > t1).astype(np.int64) + (v > t2).astype(
            np.int64)
    seg = pd.DataFrame(out_cols)
    out = (seg.groupby(["r_bucket", "f_bucket", "m_bucket"], sort=True)
           .size().reset_index(name="n_customers"))
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def dup_rate_by_source(sf_dir: str) -> pd.DataFrame:
    """Exact-duplicate rate per source (the dedup-audit report a corpus
    curation run publishes): block-local (source, text) counts collapse
    repeats before the one content-keyed groupby, then per-source doc
    and distinct-content totals ride constant-size partials. At corpus
    scale the groupby key would be a 128-bit content hash
    (``stages/dedup.py``); the fixture keys on the text itself so the
    oracle's GROUP BY text is matched exactly, collision-free."""
    ds = _t(sf_dir, "documents", ["source", "text"])

    def local(t: pa.Table) -> pa.Table:
        return (t.group_by(["source", "text"])
                .aggregate([([], "count_all")])
                .rename_columns(["source", "text", "n"]))

    groups = (ds.map_batches(local, batch_format="pyarrow")
              .groupby(["source", "text"])
              .aggregate(Sum("n", alias_name="n")))

    def per_source(t: pa.Table) -> pa.Table:
        return (pa.table({"source": t["source"], "n": t["n"]})
                .group_by("source")
                .aggregate([("n", "sum"), ([], "count_all")])
                .rename_columns(["source", "n_docs", "n_distinct"]))

    out = (groups.map_batches(per_source, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_distinct", alias_name="n_distinct"))
           .to_pandas())
    nd = out["n_docs"].to_numpy(np.int64)
    nu = out["n_distinct"].to_numpy(np.int64)
    out["n_dupes"] = (nd - nu).astype("int64")
    out["dup_rate_ppm"] = _ppm(nd - nu, nd)
    for c in ("n_docs", "n_distinct"):
        out[c] = out[c].astype("int64")
    return (out.sort_values("source").reset_index(drop=True)
            [["source", "n_docs", "n_distinct", "n_dupes",
              "dup_rate_ppm"]])


def mad_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Median absolute deviation per group (the robust dispersion
    statistic): BOTH medians come from ONE distributed (type, cents)
    histogram — the deviation distribution is a driver-side regroup of
    that value-domain-bounded frame by |v − med|, so the corpus is read
    once and never sorted. Lower-median inverse-CDF rule throughout
    (matches ``median_value_by_type``)."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return (pa.table({"event_type": t["event_type"], "cents": cents})
                .group_by(["event_type", "cents"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "cents", "cnt"]))

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()).sort_values(["event_type", "cents"])

    def lower_median(v: np.ndarray, c: np.ndarray) -> int:
        cum = np.cumsum(c)
        return int(v[int(np.searchsorted(2 * cum, cum[-1]))])

    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        v = g["cents"].to_numpy(np.int64)
        c = g["cnt"].to_numpy(np.int64)
        med = lower_median(v, c)
        dev = np.abs(v - med)
        # collapse equal deviations (v below and above med can tie);
        # np.unique sorts, so no pre-sort is needed
        uniq, inv = np.unique(dev, return_inverse=True)
        dcc = np.bincount(inv, weights=c).astype(np.int64)
        mad = lower_median(uniq, dcc)
        rows.append((et, med / 100.0, mad / 100.0))
    return pd.DataFrame(rows, columns=["event_type", "median_v", "mad_v"])


def keyset_checksum_monthly(sf_dir: str) -> pd.DataFrame:
    """Reconciliation checksums per month (the cross-system audit a
    migration runs): count, XOR-fold and sum of the key set. XOR and
    sum are order-free and mergeable, so per-block partials shuffle
    into a months-keyed reduce where a custom ``AggregateFn`` folds the
    XORs distributed — the driver only ever sees the months-sized
    result (a driver-side merge would scale with block count). Equal
    checksums on two systems certify equal key sets with overwhelming
    probability."""
    from ray.data.aggregate import AggregateFn

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        month = df["o_orderdate"].dt.to_period("M").dt.to_timestamp()
        g = pd.DataFrame({"month": month.astype("datetime64[us]"),
                          "k": df["o_orderkey"].to_numpy(np.int64)})
        out = (g.groupby("month", sort=False)["k"]
               .agg(n="size", xor=lambda s: np.bitwise_xor.reduce(
                   s.to_numpy(np.int64)), ksum="sum").reset_index())
        return out

    def _xor_block(a: int, blk) -> int:
        v = (blk["xor"].to_numpy(np.int64) if isinstance(blk, pd.DataFrame)
             else blk["xor"].to_numpy(zero_copy_only=False))
        return a ^ int(np.bitwise_xor.reduce(v))

    xor_fold = AggregateFn(init=lambda k: 0, merge=lambda a, b: a ^ b,
                           accumulate_block=_xor_block, name="key_xor")
    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby("month")
           .aggregate(xor_fold, Sum("n", alias_name="n_orders"),
                      Sum("ksum", alias_name="key_sum"))
           .to_pandas())
    for c in ("n_orders", "key_xor", "key_sum"):
        out[c] = out[c].astype("int64")
    out["month"] = out["month"].astype("datetime64[us]")
    return (out.sort_values("month").reset_index(drop=True)
            [["month", "n_orders", "key_xor", "key_sum"]])


def monthly_activity_full_join(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join of two independently-reduced monthly series
    (order volume vs shipment volume) — months present in either side
    survive with zero-fill. Both inputs reduce to months-sized frames
    BEFORE the join, so the full-outer itself is tiny; the join type
    rides the same native hash-shuffle ``Dataset.join`` as the inner/
    left variants (``stages/join.py::hash_join``)."""
    orders = _t(sf_dir, "orders", ["o_orderdate"])
    li = _t(sf_dir, "lineitem", ["l_shipdate"])

    def monthly(col: str, out: str):
        def fn(t: pa.Table) -> pa.Table:
            month = pc.cast(pc.floor_temporal(t[col], unit="month"),
                            pa.timestamp("us"))
            return (pa.table({"month": month}).group_by("month")
                    .aggregate([([], "count_all")])
                    .rename_columns(["month", out]))
        return fn

    o = (orders.map_batches(monthly("o_orderdate", "n_orders"),
                            batch_format="pyarrow")
         .groupby("month").aggregate(Sum("n_orders", alias_name="n_orders")))
    l = (li.map_batches(monthly("l_shipdate", "n_shipments"),
                        batch_format="pyarrow")
         .groupby("month").aggregate(Sum("n_shipments",
                                         alias_name="n_shipments")))
    # both sides are already months-sized, so the full-outer itself
    # belongs on the driver (the reduced-frame pattern) — a 4-bucket
    # native join over a handful of months left partitions empty
    joined = o.to_pandas().merge(l.to_pandas(), on="month", how="outer")
    out = pd.DataFrame({
        "month": joined["month"].astype("datetime64[us]"),
        "n_orders": joined["n_orders"].fillna(0).astype("int64"),
        "n_shipments": joined["n_shipments"].fillna(0).astype("int64"),
    })
    return out.sort_values("month").reset_index(drop=True)


def vocab_overlap_sources(sf_dir: str) -> pd.DataFrame:
    """Vocabulary overlap (Jaccard of word sets) between every source
    pair — the corpus-similarity matrix a mixing study consults.
    Distinct (source, word) pairs dedupe block-locally, co-partition by
    WORD hash (each word's ≤|sources| set closes per shard, pair
    fan-out is |sources|²-bounded), and the division runs on the
    pairs-sized frame against exact per-source vocabulary sizes."""
    ds = _t(sf_dir, "documents", ["source", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(t.column("text").combine_chunks())
        w = pc.list_flatten(toks)
        src = pc.take(t.column("source"), pc.list_parent_indices(toks))
        mask = pc.not_equal(w, "")
        tt = pa.table({"source": pc.filter(src, mask),
                       "w": pc.filter(w, mask)})
        tt = tt.group_by(["source", "w"]).aggregate([])
        # process-stable SipHash sharding (builtin hash is salted)
        return add_shard_column(tt, "w", 64)

    pair_df, sizes = _pairs_in_shards(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["w"], "source", with_sizes=True)
    out = pair_df.rename(columns={"source_a": "src_a",
                                  "source_b": "src_b", "n": "inter"})
    na = out["src_a"].map(sizes).to_numpy(np.int64)
    nb = out["src_b"].map(sizes).to_numpy(np.int64)
    inter = out["inter"].to_numpy(np.int64)
    out["inter"] = inter
    out["jaccard_ppm"] = _ppm(inter, na + nb - inter)
    return (out.sort_values(["src_a", "src_b"]).reset_index(drop=True)
            [["src_a", "src_b", "inter", "jaccard_ppm"]])


def revenue_drawdown(sf_dir: str) -> pd.DataFrame:
    """Maximum drawdown of the daily revenue series (peak-to-trough in
    running-max terms — the stress statistic for any monitored series):
    the corpus reduces to an integer-cent days-sized frame, and the
    running peak / drawdown scan is one vectorized cummax over that
    reduced series. Output: one row (peak day, trough day, depth)."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    day_us = 86400 * US

    def partial(t: pa.Table) -> pa.Table:
        day = pc.multiply(pc.divide(
            pa.array(np.asarray(column_ts_us(t["o_orderdate"]))),
            pa.scalar(day_us, pa.int64())), pa.scalar(day_us, pa.int64()))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"day": day, "cents": cents}).group_by("day")
                .aggregate([("cents", "sum")])
                .rename_columns(["day", "cents"]))

    daily = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("cents", alias_name="cents"))
             .to_pandas()).sort_values("day").reset_index(drop=True)
    c = daily["cents"].to_numpy(np.int64)
    peak = np.maximum.accumulate(c)
    dd = peak - c
    i = int(np.argmax(dd))  # first deepest trough
    # the peak day is the FIRST day attaining the running max before i
    p = int(np.argmax(c[:i + 1] == peak[i]))
    days = daily["day"].to_numpy(np.int64)
    return pd.DataFrame({
        "peak_day": us_to_timestamp_array(days[[p]]),
        "trough_day": us_to_timestamp_array(days[[i]]),
        "drawdown": np.array([dd[i]], dtype=np.float64) / 100.0,
    })


def order_quarters(sf_dir: str) -> pd.DataFrame:
    """Calendar-quarter rollup (date-part coverage: year + quarter from
    pure month arithmetic, no locale or strftime): per-block partials
    reduce to a (years × 4)-sized frame."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        q = pc.add(pc.divide(pc.subtract(pc.month(t["o_orderdate"]), 1), 3),
                   1)
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"year": pc.cast(y, pa.int64()),
                          "quarter": pc.cast(q, pa.int64()),
                          "cents": cents})
                .group_by(["year", "quarter"])
                .aggregate([("cents", "sum"), ([], "count_all")])
                .rename_columns(["year", "quarter", "cents", "n_orders"]))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["year", "quarter"])
           .aggregate(Sum("cents", alias_name="cents"),
                      Sum("n_orders", alias_name="n_orders"))
           .to_pandas())
    out["revenue"] = out["cents"].to_numpy(np.float64) / 100.0
    for c in ("year", "quarter", "n_orders"):
        out[c] = out[c].astype("int64")
    return (out.drop(columns=["cents"])
            .sort_values(["year", "quarter"]).reset_index(drop=True)
            [["year", "quarter", "n_orders", "revenue"]])


def part_name_stats(sf_dir: str) -> pd.DataFrame:
    """String-kernel coverage over part names (split / element-wise
    length / list max / case fold — all Arrow compute, no Python row
    loop): word count, length of the longest word, and the upper-cased
    first word per part."""
    ds = _t(sf_dir, "part", ["p_partkey", "p_name"])

    def fn(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["p_name"].combine_chunks(), " ")
        n_words = pc.list_value_length(words)
        # per-list max word length: flatten + segmented maximum.at
        flat_len = pc.utf8_length(pc.list_flatten(words))
        parent = pc.list_parent_indices(words)
        seg = np.zeros(len(t), dtype=np.int64)
        np.maximum.at(seg, np.asarray(parent),
                      flat_len.to_numpy(zero_copy_only=False))
        first = pc.utf8_upper(pc.list_element(words, 0))
        return pa.table({
            "p_partkey": t["p_partkey"],
            "n_words": pc.cast(n_words, pa.int64()),
            "max_word_len": pa.array(seg),
            "first_word_upper": first,
        })

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    out["p_partkey"] = out["p_partkey"].astype("int64")
    return out.sort_values("p_partkey").reset_index(drop=True)


def groupwise_split_documents(sf_dir: str) -> pd.DataFrame:
    """Leakage-safe train/val/test split: the split keys on the SOURCE
    (all documents of one source land in one split), so near-duplicate
    documents within a source can never straddle the train/eval
    boundary — the group-aware variant of ``split_documents``, keyed by
    the md5 of the source (hex-string threshold compare — both engines produce the
    identical lowercase digest, so the rule is exactly
    SQL-reproducible): first digest byte < 0x0d → test (~5%), < 0x26 →
    val (~15%), else train."""
    import hashlib

    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def fn(t: pa.Table) -> pa.Table:
        src = t["source"].to_numpy(zero_copy_only=False)
        # distinct sources per block are few: hash each once
        uniq, inv = np.unique(src, return_inverse=True)
        h2 = np.array([hashlib.md5(s.encode()).hexdigest()[:2]
                       for s in uniq])
        split_u = np.where(h2 < "0d", "test",
                           np.where(h2 < "26", "val", "train"))
        return pa.table({"doc_id": t["doc_id"],
                         "source": t["source"],
                         "split": pa.array(split_u[inv])})

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def trailing_hour_sum_events(sf_dir: str) -> pd.DataFrame:
    """Time-based window frame (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
    AND CURRENT ROW — the value-range sibling of the ROWS frame in
    ``moving_sum_events``): per event, the user's cent sum over the
    trailing hour INCLUDING equal-timestamp peers, exactly SQL RANGE
    peer semantics. One user co-partition; inside each shard a
    composite (user-rank · span + ts) key makes BOTH frame edges plain
    ``searchsorted`` calls on one sorted array — never a per-user loop.
    The span term bounds rank·span ≤ users-per-shard × (epoch span +
    1 h), which a windowed deployment keeps far inside int64."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        tus = series_ts_us(g["ts"]).to_numpy()
        c = np.round(g["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64)
        chg = np.ones(len(g), dtype=np.int64)
        chg[1:] = (u[1:] != u[:-1]).astype(np.int64)
        rank = np.cumsum(chg) - 1
        base = tus - tus.min()
        span = base.max() + HOUR_US + 2
        # overflow must crash, not corrupt: a wrapped composite key is
        # no longer sorted and both frame edges silently go wrong
        assert (int(rank[-1]) + 1) * int(span) < 2 ** 63, (
            "user-rank x time-span exceeds int64; shard smaller or "
            "window the epoch")
        comp = rank * span + base
        left = np.searchsorted(comp, comp - HOUR_US, side="left")
        right = np.searchsorted(comp, comp, side="right") - 1
        cum = np.cumsum(c)
        trail = cum[right] - np.where(left > 0, cum[left - 1], 0)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(np.int64),
                             "user_id": u, "trail_cents": trail})

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def quantile_cont_events(sf_dir: str) -> pd.DataFrame:
    """Interpolated quantiles per group (``quantile_cont`` — the
    continuous sibling of the discrete inverse-CDF everywhere else):
    position (n−1)·q resolves to its two bracketing order statistics by
    searchsorted over the SAME distributed (type, cents) histogram the
    discrete ops use, and the linear interpolation runs once per group
    with the oracle's own ``lo + frac·(hi − lo)`` expression shape."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return (pa.table({"event_type": t["event_type"], "cents": cents})
                .group_by(["event_type", "cents"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "cents", "cnt"]))

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()).sort_values(["event_type", "cents"])

    def interp(v: np.ndarray, cum: np.ndarray, pos: float) -> float:
        lo_i = int(np.searchsorted(cum, np.floor(pos) + 1))
        hi_i = int(np.searchsorted(cum, np.ceil(pos) + 1))
        lo = v[lo_i] / 100.0
        hi = v[hi_i] / 100.0
        return lo + (pos - np.floor(pos)) * (hi - lo)

    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        v = g["cents"].to_numpy(np.int64)
        cum = np.cumsum(g["cnt"].to_numpy(np.int64))
        n = int(cum[-1])
        rows.append((et,
                     np.round(interp(v, cum, 0.5 * (n - 1)), 6),
                     np.round(interp(v, cum, 0.9 * (n - 1)), 6)))
    return pd.DataFrame(rows, columns=["event_type", "p50_cont",
                                       "p90_cont"])


def cube_orders(sf_dir: str) -> pd.DataFrame:
    """Full CUBE over (status, priority, year) — all 8 grouping sets
    with 'ALL' markers (the grouping-sets completion of
    ``rollup_orders``): the corpus reduces ONCE to the finest-grain
    integer-cent frame (statuses × priorities × years rows) and every
    coarser set derives from that reduced frame driver-side; the cube
    never re-scans input."""
    ds = _t(sf_dir, "orders", ["o_orderstatus", "o_orderpriority",
                               "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        y = pc.cast(pc.year(t["o_orderdate"]), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"status": t["o_orderstatus"],
                          "priority": t["o_orderpriority"],
                          "year": y, "cents": cents})
                .group_by(["status", "priority", "year"])
                .aggregate([("cents", "sum"), ([], "count_all")])
                .rename_columns(["status", "priority", "year",
                                 "cents", "n_orders"]))

    fine = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["status", "priority", "year"])
            .aggregate(Sum("cents", alias_name="cents"),
                       Sum("n_orders", alias_name="n_orders"))
            .to_pandas())
    fine["year"] = fine["year"].astype("int64")
    dims = ["status", "priority", "year"]
    frames = []
    for mask in range(8):  # bit i set -> dim i kept
        keep = [d for i, d in enumerate(dims) if mask >> i & 1]
        g = (fine.groupby(keep, sort=False)[["cents", "n_orders"]]
             .sum().reset_index() if keep
             else fine[["cents", "n_orders"]].sum().to_frame().T)
        for d in dims:
            if d not in keep:
                g[d] = "ALL" if d != "year" else -1
        frames.append(g[dims + ["cents", "n_orders"]])
    out = pd.concat(frames, ignore_index=True)
    out["revenue"] = out["cents"].to_numpy(np.float64) / 100.0
    out["year"] = out["year"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return (out.drop(columns=["cents"])
            .sort_values(dims).reset_index(drop=True)
            [dims + ["n_orders", "revenue"]])


def basket_lift_events(sf_dir: str) -> pd.DataFrame:
    """Association-rule lift per co-occurring type pair —
    P(a,b)/(P(a)·P(b)) over (user, day) baskets, the market-basket
    strength metric on top of ``cooccurrence_pairs_events``. All three
    probabilities share one denominator (the distinct-basket count), so
    lift = inter·B / (nₐ·n_b) is an exact integer ratio shipped as
    half-away ppm; pairs and per-type basket counts ride the shared
    ``_pairs_in_shards`` kernel, and B is one tiny distinct reduce."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    day_us = 86400 * US

    def sharded(t: pa.Table) -> pa.Table:
        day = pc.divide(pa.array(np.asarray(column_ts_us(t["ts"]))),
                        pa.scalar(day_us, pa.int64()))
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return (pa.table({"user_id": t["user_id"], "day": day,
                          "event_type": t["event_type"], "_shard": shard})
                .group_by(["user_id", "day", "event_type", "_shard"])
                .aggregate([]))

    pre = ds.map_batches(sharded, batch_format="pyarrow")
    pairs, sizes, n_baskets = _pairs_in_shards(
        pre, ["user_id", "day"], "event_type",
        with_sizes=True, with_basket_count=True)

    out = pairs.rename(columns={"event_type_a": "type_a",
                                "event_type_b": "type_b",
                                "n": "inter"})
    na = out["type_a"].map(sizes).astype(object).to_numpy()
    nb = out["type_b"].map(sizes).astype(object).to_numpy()
    inter = out["inter"].astype(object).to_numpy()
    out["inter"] = out["inter"].astype("int64")
    out["lift_ppm"] = _ppm(inter * n_baskets, na * nb)
    return (out.sort_values(["type_a", "type_b"])
            .reset_index(drop=True)[["type_a", "type_b", "inter",
                                     "lift_ppm"]])


def above_avg_orders(sf_dir: str) -> pd.DataFrame:
    """Scalar-subquery pattern (rows above the GLOBAL average): pass 1
    reduces to the two exact integer sums behind the average, pass 2 is
    a pure-map filter against that one broadcast scalar — both engines
    compare against the identical double (SX/N of the same ints), so
    the boundary rows agree exactly."""
    ds = _t(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def moments(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return pa.table({"sx": pa.array([pc.sum(cents).as_py() or 0],
                                        pa.int64()),
                         "n": pa.array([len(t)], pa.int64())})

    m = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    avg = float(m["sx"].sum()) / float(m["n"].sum()) / 100.0

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["o_totalprice"], pa.scalar(avg, pa.float64()))
        tt = t.filter(keep)
        cents = pc.cast(pc.round(pc.multiply(tt["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"o_orderpriority": tt["o_orderpriority"],
                          "cents": cents})
                .group_by("o_orderpriority")
                .aggregate([("cents", "sum"), ([], "count_all")])
                .rename_columns(["o_orderpriority", "cents", "n_orders"]))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("o_orderpriority")
           .aggregate(Sum("cents", alias_name="cents"),
                      Sum("n_orders", alias_name="n_orders"))
           .to_pandas())
    out["revenue"] = out["cents"].to_numpy(np.float64) / 100.0
    out["n_orders"] = out["n_orders"].astype("int64")
    return (out.drop(columns=["cents"])
            .sort_values("o_orderpriority").reset_index(drop=True)
            [["o_orderpriority", "n_orders", "revenue"]])


def bfs_copurchase_levels(sf_dir: str, max_level: int = 3) -> pd.DataFrame:
    """Graph traversal (BFS levels from a seed node — the recursive-CTE
    family next to pagerank/components): edges come from the shared
    co-purchase kernel, then each level is ONE pure-map pass over the
    edge Dataset with the frontier broadcast once per task; the visited
    set stays node-bounded on the driver (the same contract as
    ``doc_components``' label frame). First reach = minimum level, so
    the output matches the oracle's min-level recursive expansion."""
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["l_orderkey"],
                                        pa.scalar(63, pa.int64())), pa.int64())
        return (pa.table({"l_orderkey": t["l_orderkey"],
                          "l_partkey": t["l_partkey"], "_shard": shard})
                .group_by(["l_orderkey", "l_partkey", "_shard"])
                .aggregate([]))

    pairs, _ = _pairs_in_shards(
        ds.map_batches(sharded, batch_format="pyarrow"),
        ["l_orderkey"], "l_partkey")
    pairs = pairs[pairs["n"] >= 2]
    # symmetric edge Dataset (stays distributed; the driver only ever
    # holds node-id sets)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(np.concatenate([pairs["l_partkey_a"].to_numpy(np.int64),
                                        pairs["l_partkey_b"].to_numpy(np.int64)])),
        "dst": pa.array(np.concatenate([pairs["l_partkey_b"].to_numpy(np.int64),
                                        pairs["l_partkey_a"].to_numpy(np.int64)])),
    })).materialize()

    seed = int(pairs["l_partkey_a"].min())
    levels = {seed: 0}
    frontier = {seed}
    for lvl in range(1, max_level + 1):
        f_ref = ray.put(frontier)

        def expand(t: pa.Table) -> pa.Table:
            f = broadcast_get(f_ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            mask = np.isin(src, np.fromiter(f, dtype=np.int64))
            return (pa.table({"dst": t["dst"].filter(pa.array(mask))})
                    .group_by("dst").aggregate([]))

        reached = (edges.map_batches(expand, batch_format="pyarrow")
                   .to_pandas()["dst"].unique())
        frontier = {int(d) for d in reached} - set(levels)
        if not frontier:
            break
        for nd in frontier:
            levels[nd] = lvl
    out = pd.DataFrame(sorted(levels.items()), columns=["node", "level"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def percent_rank_orders(sf_dir: str) -> pd.DataFrame:
    """PERCENT_RANK per group with NO global sort — completes the rank
    family (rank/dense_rank/cume_dist/ntile/percent_rank): ranks derive
    from the same value-domain-bounded (priority, bucket) histogram as
    ``dense_rank_orders`` — rank() of a row is the cumulative count of
    strictly smaller buckets + 1, broadcast back via searchsorted — and
    (rank−1)/(n−1) ships as exact half-away ppm."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority",
                               "o_totalprice"])

    def bucketed(t: pa.Table) -> pa.Table:
        bkt = pc.cast(pc.floor(pc.divide(t["o_totalprice"], 1000.0)),
                      pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_orderpriority": t["o_orderpriority"],
                         "bucket": bkt})

    withb = ds.map_batches(bucketed, batch_format="pyarrow")
    hist = (withb.map_batches(
        lambda t: (t.group_by(["o_orderpriority", "bucket"])
                   .aggregate([([], "count_all")])
                   .rename_columns(["o_orderpriority", "bucket", "n"])),
        batch_format="pyarrow")
        .groupby(["o_orderpriority", "bucket"])
        .aggregate(Sum("n", alias_name="n")).to_pandas())
    table = {}
    totals = {}
    for prio, sub in hist.sort_values("bucket").groupby("o_orderpriority"):
        v = sub["bucket"].to_numpy(np.int64)
        c = sub["n"].to_numpy(np.int64)
        # rank of a row with bucket v = (# rows with smaller bucket) + 1
        table[prio] = (v, np.concatenate(([0], np.cumsum(c)[:-1])))
        totals[prio] = int(c.sum())
    t_ref = ray.put((table, totals))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        tbl, tot = broadcast_get(t_ref)
        bkt = df["bucket"].to_numpy(np.int64)
        rank = np.empty(len(df), dtype=np.int64)
        n = np.empty(len(df), dtype=np.int64)
        for prio in np.unique(df["o_orderpriority"]):
            m = df["o_orderpriority"].to_numpy() == prio
            v, cumb = tbl[prio]
            rank[m] = cumb[np.searchsorted(v, bkt[m])] + 1
            n[m] = tot[prio]
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "o_orderpriority": df["o_orderpriority"],
            "pr_ppm": _ppm(rank - 1, np.maximum(n - 1, 1)),
        })

    out = withb.map_batches(assign, batch_format="pandas").to_pandas()
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["pr_ppm"] = out["pr_ppm"].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def ewma_last_per_user(sf_dir: str, alpha: float = 0.3) -> pd.DataFrame:
    """Per-user exponentially-weighted moving average (final smoothed
    value per user) — the order-dependent recursive statistic (rows-only:
    not ANSI SQL; pinned against pandas ewm by ``test_analytics_ops``).
    One user co-partition; inside each shard pandas' C-grouped ewm does
    the recursion — never a per-user Python loop."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(
            drop=True)
        # Cython-grouped ewm: one kernel call for the whole shard
        ew = (g.groupby("user_id", sort=False)["value"]
              .ewm(alpha=alpha, adjust=False).mean().droplevel(0)
              .sort_index().to_numpy(np.float64))
        gb = g.groupby("user_id", sort=False)
        last_idx = gb.tail(1).index.to_numpy()
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(np.int64)[last_idx],
            "n_events": gb.size().to_numpy(np.int64),
            "ewma6": np.round(ew[last_idx], 6),
        })

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def triangle_count_copurchase(sf_dir: str) -> pd.DataFrame:
    """Triangle counting on the co-purchase graph (the classic cohesion
    metric over ``copurchase_part_pairs``'s edges): pair mining runs
    distributed via the shared co-basket kernel and the support-2 filter
    prunes the edge list to the heavy-hitter subgraph BEFORE enumeration,
    so the a<b<c wedge-close join (e(a,b) x e(b,c) ⋉ e(a,c)) runs on the
    reduced edge frame — a documented output-invariant single-task
    cutoff like the union-find in ``doc_components``; at 100 TB the same
    two merges run as partitioned hash joins keyed on the shared vertex
    (``stages/join.py:hash_join``), with the min-vertex orientation
    bounding per-key fan-out. Output: top-20 parts by triangle count."""
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["l_orderkey"],
                                        pa.scalar(63, pa.int64())), pa.int64())
        return (pa.table({"l_orderkey": t["l_orderkey"],
                          "l_partkey": t["l_partkey"], "_shard": shard})
                .group_by(["l_orderkey", "l_partkey", "_shard"])
                .aggregate([]))

    pairs, _ = _pairs_in_shards(
        ds.map_batches(sharded, batch_format="pyarrow"),
        ["l_orderkey"], "l_partkey")
    e = pairs[pairs["n"] >= 2].rename(
        columns={"l_partkey_a": "a", "l_partkey_b": "b"})[["a", "b"]]
    # wedges a-b-c with a<b<c (edges are already a<b oriented) ...
    w = e.merge(e.rename(columns={"a": "b", "b": "c"}), on="b")
    # ... closed by the third edge (a, c)
    tri = w.merge(e.rename(columns={"b": "c"}), on=["a", "c"])
    nodes = pd.concat([tri["a"], tri["b"], tri["c"]], ignore_index=True)
    out = (nodes.value_counts().rename_axis("part")
           .reset_index(name="n_triangles"))
    out = out.sort_values(["n_triangles", "part"],
                          ascending=[False, True]).head(20)
    for c in ("part", "n_triangles"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def max_concurrent_sessions(sf_dir: str, gap_s: int = 7200) -> pd.DataFrame:
    """Peak simultaneous sessions (interval-overlap sweep-line): sessions
    come from the gap-rule sessionizer inside 32 user shards, each
    session emits a (+1 at start, -1 at end) boundary pair, and the
    sweep runs as a two-level exact prefix max — deltas co-partition by
    calendar day, each day task sorts only its own boundaries (starts
    before ends at equal ts) and reports (delta_sum, local_max,
    first_peak_ts), then the days-sized frame combines on the driver
    with a running offset. Concurrency only attains new values at +1
    rows, so delta-less days can never hold the peak and the two-level
    split is exact."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    gap_us = gap_s * US
    day_us = 86_400 * US

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def sessions_to_deltas(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        ts_us = series_ts_us(g["ts"]).to_numpy()
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (np.diff(ts_us) > gap_us)
        start_idx = np.flatnonzero(brk)
        end_idx = np.append(start_idx[1:], len(g)) - 1
        st, en = ts_us[start_idx], ts_us[end_idx]
        ts = np.concatenate([st, en])
        delta = np.concatenate([np.ones(len(st), np.int64),
                                -np.ones(len(en), np.int64)])
        return pd.DataFrame({"_day": (ts // day_us) * day_us,
                             "ts_us": ts, "delta": delta})

    def per_day(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts_us"].to_numpy(np.int64)
        d = g["delta"].to_numpy(np.int64)
        order = np.lexsort((-d, ts))  # ts asc, +1 before -1 at ties
        prefix = np.cumsum(d[order])
        local_max = int(prefix.max())
        peak = int(np.flatnonzero(prefix == local_max)[0])
        return pd.DataFrame({"_day": g["_day"].iloc[:1],
                             "delta_sum": [int(prefix[-1])],
                             "local_max": [local_max],
                             "peak_ts_us": [int(ts[order][peak])]})

    days = (ds.map_batches(sharded, batch_format="pyarrow")
            .groupby("_shard").map_groups(sessions_to_deltas,
                                          batch_format="pandas")
            .groupby("_day").map_groups(per_day, batch_format="pandas")
            .to_pandas().sort_values("_day").reset_index(drop=True))
    offset = np.concatenate(
        [[0], np.cumsum(days["delta_sum"].to_numpy(np.int64))[:-1]])
    peaks = offset + days["local_max"].to_numpy(np.int64)
    best = int(peaks.max())
    first = int(np.flatnonzero(peaks == best)[0])
    return pd.DataFrame({
        "max_concurrent": np.array([best], np.int64),
        "first_peak_ts": us_to_timestamp_array(
            np.array([days["peak_ts_us"].iloc[first]], np.int64)),
    })


def state_intervals_events(sf_dir: str) -> pd.DataFrame:
    """SCD2-style state-interval construction (collapse each user's
    consecutive runs of one event_type into validity intervals with
    valid_from / valid_to and a run length): one user co-partition, one
    sort per shard, run breaks from a vectorized type/user shift —
    valid_to is the next run's valid_from within the user (NULL on the
    open tail), matching LEAD over the grouped runs."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        ts = g["ts"].to_numpy()
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        start_idx = np.flatnonzero(brk)
        n_events = np.diff(np.append(start_idx, len(g)))
        user, state, vfrom = u[start_idx], et[start_idx], ts[start_idx]
        vto = np.append(vfrom[1:], np.datetime64("NaT", "us"))
        vto[np.append(user[1:] != user[:-1], True)] = np.datetime64(
            "NaT", "us")
        return pd.DataFrame({"user_id": user, "state": state,
                             "valid_from": vfrom, "valid_to": vto,
                             "n_events": n_events.astype(np.int64)})

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return (out.sort_values(["user_id", "valid_from"])
            .reset_index(drop=True))


def unpivot_lineitem(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT/melt reshaping (wide measures -> long (measure, value)
    rows) with a per-(flag, measure) aggregate on top: each block melts
    its four measure columns into one long Arrow table (pure reshaping,
    no row loop), converts to exact cents, and folds a count+sum partial
    so the shuffle carries 12 rows per block."""
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    names = ["quantity", "extendedprice", "discount", "tax"]
    ds = _t(sf_dir, "lineitem", ["l_returnflag"] + measures)

    def partial(t: pa.Table) -> pa.Table:
        longs = [pa.table({
            "flag": t["l_returnflag"],
            "measure": pa.array([nm] * len(t), pa.string()),
            "c": pc.cast(pc.round(pc.multiply(t[m], 100.0)), pa.int64()),
        }) for m, nm in zip(measures, names)]
        return (pa.concat_tables(longs)
                .group_by(["flag", "measure"])
                .aggregate([("c", "sum"), ("c", "count")])
                .rename_columns(["flag", "measure", "cents", "n"]))

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (parts.groupby(["flag", "measure"], sort=True)
           .agg(n=("n", "sum"), cents=("cents", "sum")).reset_index())
    out["total"] = out.pop("cents").to_numpy(np.float64) / 100.0
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def budget_allocation_nations(sf_dir: str, budget: int = 1_000_000) -> pd.DataFrame:
    """Largest-remainder (Hamilton) apportionment: allocate a fixed
    integer budget across nations proportional to order revenue so the
    parts sum EXACTLY to the budget. Revenue reduces to a nations-sized
    integer-cent frame (broadcast dimension chain + per-block partials);
    the floor-share / remainder-rank arithmetic runs in arbitrary
    precision on that 25-row frame — ties on remainder break by nation
    key, matching the oracle's row_number."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    dim = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    dim = dim[["c_custkey", "n_nationkey", "n_name"]].rename(
        columns={"c_custkey": "o_custkey"})
    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = broadcast_join(ds, dim, on="o_custkey", how="inner",
                            concurrency=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["o_totalprice"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)
        return (pd.DataFrame({"nk": df["n_nationkey"],
                              "n_name": df["n_name"], "cents": cents})
                .groupby(["nk", "n_name"], sort=False)["cents"]
                .sum().reset_index())

    out = (joined.map_batches(partial, batch_format="pandas").to_pandas()
           .groupby(["nk", "n_name"], sort=True)["cents"]
           .sum().reset_index())
    cents = out["cents"].to_numpy().astype(object)  # exact big ints
    tot = int(cents.sum())
    base = np.array([int(budget) * int(c) // tot for c in cents],
                    dtype=object)
    rem = np.array([int(budget) * int(c) % tot for c in cents],
                   dtype=object)
    leftover = int(budget) - int(base.sum())
    # rank by (remainder desc, nation key asc); top `leftover` get +1
    order = sorted(range(len(out)),
                   key=lambda i: (-rem[i], int(out["nk"].iloc[i])))
    alloc = base.astype(np.int64)
    alloc[order[:leftover]] += 1
    res = pd.DataFrame({
        "n_name": out["n_name"],
        "revenue": out["cents"].to_numpy(np.float64) / 100.0,
        "alloc_units": alloc,
    })
    return res.sort_values("n_name").reset_index(drop=True)


def order_date_gaps(sf_dir: str) -> pd.DataFrame:
    """Calendar gap detection (missing-day ranges in the order stream —
    the sequence-completeness audit a feed monitor runs): the corpus
    reduces to its distinct order dates (block-local unique partials,
    one distinct-day groupby), and the lead-diff gap scan runs on that
    days-sized frame. Output: one row per gap with its bounds and
    width."""
    ds = _t(sf_dir, "orders", ["o_orderdate"])

    def distinct_days(t: pa.Table) -> pa.Table:
        return (pa.table({"day": pc.cast(t["o_orderdate"],
                                         pa.timestamp("us"))})
                .group_by("day").aggregate([]))

    days = (ds.map_batches(distinct_days, batch_format="pyarrow")
            .groupby("day").count().to_pandas())
    d_us = np.sort(series_ts_us(days["day"]).to_numpy())
    day_us = 86_400 * US
    diff = np.diff(d_us)
    gaps = np.flatnonzero(diff > day_us)
    return pd.DataFrame({
        "gap_start": us_to_timestamp_array(d_us[gaps] + day_us),
        "gap_end": us_to_timestamp_array(d_us[gaps + 1] - day_us),
        "missing_days": (diff[gaps] // day_us - 1).astype(np.int64),
    })


def twap_value_per_user(sf_dir: str) -> pd.DataFrame:
    """Time-weighted average (TWAP — each value weighted by how long it
    was 'current' until the user's next event): one user co-partition,
    one sort per shard, then exact arithmetic end-to-end — integer-cent
    x microsecond-duration products sum as arbitrary-precision ints
    (they overflow int64 at month-long spans; the oracle mirrors with
    HUGEINT) and the final micro-unit ratio uses the shared half-away
    division rule. Single-event users have no duration and drop."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        ts_us = series_ts_us(g["ts"]).to_numpy()
        cents = np.round(g["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64)
        last = np.append(u[1:] != u[:-1], True)
        dur = np.append(np.diff(ts_us), 0)
        dur[last] = 0  # no next event -> no holding period
        prod = cents.astype(object) * dur.astype(object)  # exact big ints
        f = pd.DataFrame({"user_id": u, "num": prod, "ts_us": ts_us})
        agg = (f.groupby("user_id", sort=False)
               .agg(num=("num", "sum"), t_min=("ts_us", "min"),
                    t_max=("ts_us", "max"), n_events=("ts_us", "size"))
               .reset_index())
        return agg

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    out = out[(out["n_events"] >= 2)
              & (out["t_max"] > out["t_min"])].reset_index(drop=True)
    den = (out["t_max"] - out["t_min"]).to_numpy().astype(object) * 100
    out["twap_micro"] = _ppm(out["num"].to_numpy(), den)
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return (out[["user_id", "n_events", "twap_micro"]]
            .sort_values("user_id").reset_index(drop=True))


def session_depth_histogram(sf_dir: str, gap_s: int = 7200) -> pd.DataFrame:
    """Session-depth distribution (how many sessions contain exactly k
    events — the engagement-depth histogram over the sessionizer's
    output): sessions come from the gap rule inside 32 user shards,
    each shard histograms its own session lengths, and the final reduce
    carries at most max-depth rows per shard."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    gap_us = gap_s * US

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        ts_us = series_ts_us(g["ts"]).to_numpy()
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (np.diff(ts_us) > gap_us)
        start_idx = np.flatnonzero(brk)
        depth = np.diff(np.append(start_idx, len(g)))
        v, c = np.unique(depth, return_counts=True)
        return pd.DataFrame({"depth": v.astype(np.int64),
                             "n_sessions": c.astype(np.int64)})

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas()
           .groupby("depth", sort=True)["n_sessions"].sum().reset_index())
    for c in ("depth", "n_sessions"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def mutual_info_type_hour(sf_dir: str) -> pd.DataFrame:
    """Mutual-information feature relevance (how much hour-of-day tells
    about event_type — chi-square's information-theoretic sibling over
    the same contingency): observed counts reduce to the groups-x-24
    frame via the identical partial shape as ``chi2_type_hour``, and
    each type's KL contribution sum((o/n)·ln(o·n/(rt·ct))) computes
    driver-side from exact integer marginals, rounded to 6."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    _schema = pa.schema([("event_type", pa.string()), ("h", pa.int64()),
                         ("o", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        h = (np.asarray(column_ts_us(t["ts"])) // HOUR_US) % 24
        tt = pa.table({"event_type": t["event_type"], "h": pa.array(h)})
        return (tt.group_by(["event_type", "h"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "h", "o"]).cast(_schema))

    c = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby(["event_type", "h"]).aggregate(Sum("o", alias_name="o"))
         .to_pandas())
    pivot = c.pivot_table(index="event_type", columns="h", values="o",
                          aggfunc="sum", fill_value=0)
    obs = pivot.to_numpy(np.float64)
    rt = obs.sum(axis=1, keepdims=True)
    ct = obs.sum(axis=0, keepdims=True)
    n = obs.sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        term = np.where(obs > 0,
                        (obs / n) * np.log(obs * n / (rt * ct)), 0.0)
    out = pd.DataFrame({"event_type": pivot.index,
                        "mi_6": np.round(term.sum(axis=1), 6)})
    return out.sort_values("event_type").reset_index(drop=True)


def fuzzy_name_pairs_parts(sf_dir: str, max_dist: int = 3) -> pd.DataFrame:
    """Blocked similarity self-join (distinct part names within edit
    distance 1..3 — the fuzzy-key record-linkage step exact dedup
    can't do): the name DOMAIN reduces distributed first (block-local
    unique partials + one distinct groupby), then candidate pairs block
    on |length difference| <= max_dist before the row-vectorized DP
    kernel scores them — at 100 TB the domain frame re-shards by
    length bucket and each bucket scores independently; here it is a
    64-name reduced frame."""
    ds = _t(sf_dir, "part", ["p_name"])

    def distinct_names(t: pa.Table) -> pa.Table:
        return (pa.table({"name": t["p_name"]})
                .group_by("name").aggregate([]))

    names = (ds.map_batches(distinct_names, batch_format="pyarrow")
             .groupby("name").count().to_pandas()["name"]
             .sort_values().to_numpy())
    lens = np.array([len(s) for s in names])
    rows = []
    for i, probe in enumerate(names[:-1]):
        cand_idx = np.flatnonzero(
            np.abs(lens[i + 1:] - lens[i]) <= max_dist) + i + 1
        if len(cand_idx) == 0:
            continue
        cand = pa.array(names[cand_idx], pa.string())
        d = np.asarray(_levenshtein_batch(cand, probe))
        hit = d <= max_dist
        if hit.any():
            rows.append(pd.DataFrame({
                "name_a": probe, "name_b": names[cand_idx[hit]],
                "dist": d[hit].astype(np.int64)}))
    out = (pd.concat(rows, ignore_index=True) if rows
           else pd.DataFrame({"name_a": pd.Series([], dtype=str),
                              "name_b": pd.Series([], dtype=str),
                              "dist": pd.Series([], dtype="int64")}))
    return (out.sort_values(["name_a", "name_b"])
            .reset_index(drop=True))


def winsorized_stats_events(sf_dir: str) -> pd.DataFrame:
    """Winsorized robust statistics (clip each type's values at its own
    p05/p95, then the clipped mean — the outlier-insensitive location
    estimate a quality monitor trends): the same distinct-value cents
    histogram as ``iqr_outliers_events`` feeds inverted-CDF quantiles,
    and the clipped sum is one vectorized pass over that tiny frame —
    exact integers end-to-end, half-away micro-unit mean."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    _schema = pa.schema([("event_type", pa.string()),
                         ("cents", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        cents = np.round(t["value"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        return (pa.table({"event_type": t["event_type"],
                          "cents": pa.array(cents)})
                .group_by(["event_type", "cents"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "cents", "n"])
                .cast(_schema))

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    rows = []
    for etype, sub in hist.groupby("event_type"):
        sub = sub.sort_values("cents")
        vals = sub["cents"].to_numpy(np.int64)
        cnt = sub["n"].to_numpy(np.int64)
        cum = cnt.cumsum()
        n = int(cum[-1])
        p05 = int(vals[np.searchsorted(cum, (5 * n + 99) // 100)])
        p95 = int(vals[np.searchsorted(cum, (95 * n + 99) // 100)])
        clipped = np.clip(vals, p05, p95).astype(object)
        s = int((clipped * cnt.astype(object)).sum())
        rows.append((etype, p05, p95,
                     int(_ppm(np.array([s], object),
                              np.array([n * 100], object))[0])))
    out = pd.DataFrame(rows, columns=["event_type", "p05_cents",
                                      "p95_cents", "wmean_micro"])
    for c in ("p05_cents", "p95_cents", "wmean_micro"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def neighbor_count_events(sf_dir: str, band_s: int = 300) -> pd.DataFrame:
    """Time-band self-join (for every event, how many OTHER events the
    same user fired within ±5 minutes — the burst-density feature a
    bot detector reads): the range-join sibling of
    ``trailing_hour_sum_events`` — one user co-partition and a
    composite (user-rank · span + ts) key turn both band edges into
    plain searchsorted calls; no per-user loop, no quadratic join."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    band_us = band_s * US

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        tus = series_ts_us(g["ts"]).to_numpy()
        chg = np.ones(len(g), dtype=np.int64)
        chg[1:] = (u[1:] != u[:-1]).astype(np.int64)
        rank = np.cumsum(chg) - 1
        base = tus - tus.min()
        span = base.max() + band_us + 2  # band edges stay inside the user
        assert (int(rank[-1]) + 1) * int(span) < 2 ** 63, (
            "user-rank x time-span exceeds int64; shard smaller or "
            "window the epoch")
        comp = rank * span + base
        left = np.searchsorted(comp, comp - band_us, side="left")
        right = np.searchsorted(comp, comp + band_us, side="right")
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(np.int64),
                             "n_neighbors": right - left - 1})

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def users_all_event_types(sf_dir: str) -> pd.DataFrame:
    """Relational division (users who performed EVERY event type — the
    'for all' join SQL expresses with a double NOT EXISTS or a
    distinct-count equality): the divisor cardinality reduces to an
    alphabet-sized frame, and the per-user distinct counts finish
    inside one 32-shard user co-partition (a user lives in exactly one
    shard, so shard-local distinct IS global) — the pair-domain
    groupby a first cut shuffled was priced by its group count, the
    ``top_parts_in_top_nations`` lesson. Each shard emits only its
    qualifying users."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def types_partial(t: pa.Table) -> pa.Table:
        return (pa.table({"event_type": t["event_type"]})
                .group_by("event_type").aggregate([]))

    k_all = (ds.map_batches(types_partial, batch_format="pyarrow")
             .groupby("event_type").count().count())

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return (pa.table({"user_id": t["user_id"],
                          "event_type": t["event_type"],
                          "_shard": shard})
                .group_by(["user_id", "event_type", "_shard"])
                .aggregate([]))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        cnt = (g.drop_duplicates(["user_id", "event_type"])
               .groupby("user_id", sort=False).size())
        return pd.DataFrame({
            "user_id": cnt[cnt == k_all].index.to_numpy(np.int64)})

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def u_shape_attribution_events(sf_dir: str) -> pd.DataFrame:
    """U-shaped (position-based) marketing attribution: each user's
    events STRICTLY before their first purchase share one unit of
    credit — 40/40% to first and last touch, the middle 20% split
    half-away-evenly — and credit sums per event_type in exact ppm
    integers. One user co-partition; first-purchase index, prefix
    masks, ranks and the credit formula are all vectorized (pre-rows
    are a contiguous prefix of each sorted user group, so rank is
    plain index arithmetic)."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        idx = np.arange(len(g))
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        gid = np.cumsum(new_user) - 1
        ngroups = int(gid[-1]) + 1 if len(g) else 0
        big = np.iinfo(np.int64).max
        fp = np.full(ngroups, big, np.int64)
        is_p = et == "purchase"
        np.minimum.at(fp, gid[is_p], idx[is_p])
        pre = (idx < fp[gid]) & (fp[gid] < big)
        starts = np.flatnonzero(new_user)
        rn = idx - starts[gid] + 1
        k = np.bincount(gid[pre], minlength=ngroups)
        k_row, rn_row = k[gid[pre]], rn[pre]
        d = np.maximum(k_row - 2, 1)
        mid = (2 * 200_000 + d) // (2 * d)
        credit = np.where(
            k_row == 1, 1_000_000,
            np.where(k_row == 2, 500_000,
                     np.where((rn_row == 1) | (rn_row == k_row),
                              400_000, mid)))
        return (pd.DataFrame({"event_type": et[pre], "credit": credit})
                .groupby("event_type", sort=False)["credit"]
                .sum().reset_index())

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas()
           .groupby("event_type", sort=True)["credit"].sum()
           .reset_index().rename(columns={"credit": "credit_ppm"}))
    out["credit_ppm"] = out["credit_ppm"].astype("int64")
    return out.reset_index(drop=True)


def nation_avg_percentile(sf_dir: str) -> pd.DataFrame:
    """Group-vs-global distribution benchmark (where each nation's
    average order value sits in the GLOBAL order distribution): the
    per-nation exact (sum, count) moments reduce first, then the
    strictly-below test c*m < s is rewritten c <= floor((s-1)/m) so 25
    exact integer cutoffs broadcast into a second narrow scan — the
    global distribution never shuffles (the old distinct-cents
    histogram groupby priced its exchange by group count ~ row count);
    each block answers every cutoff with one sort + searchsorted and
    emits a nations-sized partial. No float mean ever exists, so there
    is no boundary to disagree on."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    dim = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    dim = dim[["c_custkey", "n_name"]].rename(
        columns={"c_custkey": "o_custkey"})
    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = broadcast_join(ds, dim, on="o_custkey", how="inner",
                            concurrency=8)

    def nation_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["o_totalprice"].to_numpy(np.float64)
                         * 100.0).astype(np.int64)
        f = pd.DataFrame({"n_name": df["n_name"], "cents": cents})
        return (f.groupby("n_name", sort=False)
                .agg(s=("cents", "sum"), m=("cents", "size"))
                .reset_index())

    nations = (joined.map_batches(nation_partial, batch_format="pandas")
               .to_pandas()
               .groupby("n_name", sort=True)
               .agg(s=("s", "sum"), m=("m", "sum")).reset_index())
    # c*m < s  <=>  c <= (s-1)//m  for positive integer m — exact, and
    # the per-row comparison stays in int64 (no c*m product to overflow)
    cuts = np.array([int(s - 1) // int(m)
                     for s, m in zip(nations["s"], nations["m"])],
                    dtype=np.int64)
    names = nations["n_name"].to_numpy()
    _pschema = pa.schema([("n_name", pa.string()), ("below", pa.int64()),
                          ("total", pa.int64())])

    def below_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _pschema.empty_table()
        cents = np.sort(pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], 100.0)),
            pa.int64()).to_numpy(zero_copy_only=False))
        below = np.searchsorted(cents, cuts, side="right")
        return pa.table({"n_name": pa.array(names),
                         "below": pa.array(below.astype(np.int64)),
                         "total": pa.array(np.full(len(cuts), len(cents),
                                                   np.int64))})

    parts = (ds.map_batches(below_partial, batch_format="pyarrow")
             .to_pandas()
             .groupby("n_name", sort=True)
             .agg(below=("below", "sum"), total=("total", "sum"))
             .reset_index())
    out = pd.DataFrame({
        "n_name": parts["n_name"],
        "pct_ppm": _ppm(parts["below"].to_numpy(np.int64).astype(object),
                        parts["total"].to_numpy(np.int64).astype(object)),
    })
    return out.sort_values("n_name").reset_index(drop=True)


def autocorr7_daily_revenue(sf_dir: str) -> pd.DataFrame:
    """Weekly-seasonality detector (lag-7 autocorrelation of the daily
    revenue series): the corpus reduces to integer-cent daily partials
    first, the (day, day+7) self-pairing joins the OBSERVED days only
    (calendar holes drop the pair, matching the oracle's equi-join),
    and Pearson runs once from arbitrary-precision moment sums — the
    cross-products overflow int64 at year-long spans, so the partials
    sum as Python ints and the oracle mirrors with HUGEINT."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    _schema = pa.schema([("day", pa.timestamp("us")), ("cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        day = pc.cast(pc.floor_temporal(
            pc.cast(t["o_orderdate"], pa.timestamp("us")), unit="day"),
            pa.timestamp("us"))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"day": day, "cents": cents})
                .group_by("day").aggregate([("cents", "sum")])
                .rename_columns(["day", "cents"]).cast(_schema))

    days = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("cents", alias_name="cents"))
            .to_pandas())
    d_us = series_ts_us(days["day"]).to_numpy()
    order = np.argsort(d_us)
    d_us, cents = d_us[order], days["cents"].to_numpy(np.int64)[order]
    week_us = 7 * 86_400 * US
    j = np.searchsorted(d_us, d_us + week_us)
    ok = (j < len(d_us)) & (d_us[np.minimum(j, len(d_us) - 1)]
                            == d_us + week_us)
    x = cents[ok].astype(object)
    y = cents[j[ok]].astype(object)
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    sxy = int((x * y).sum())
    num = float(n * sxy - sx * sy)
    den = float(n * sxx - sx * sx) * float(n * syy - sy * sy)
    r = num / np.sqrt(den)
    return pd.DataFrame({"n_pairs": np.array([n], np.int64),
                         "acf7_6": [round(float(r), 6)]})


def level_shift_daily_revenue(sf_dir: str, min_seg: int = 7) -> pd.DataFrame:
    """Changepoint scan (the split of the daily revenue series with the
    largest |prefix mean − suffix mean| — a drift alarm over a feed):
    the series reduces to a days-sized integer frame, both cumulative
    sums are one vectorized pass, and every candidate split's shift
    quantizes to exact half-away micro-units BEFORE the argmax so both
    engines compare identical integers (ties take the earliest day).
    Segments shorter than ``min_seg`` days are not candidates."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    _schema = pa.schema([("day", pa.timestamp("us")), ("cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        day = pc.cast(pc.floor_temporal(
            pc.cast(t["o_orderdate"], pa.timestamp("us")), unit="day"),
            pa.timestamp("us"))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"day": day, "cents": cents})
                .group_by("day").aggregate([("cents", "sum")])
                .rename_columns(["day", "cents"]).cast(_schema))

    days = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("cents", alias_name="cents"))
            .to_pandas().sort_values("day").reset_index(drop=True))
    c = days["cents"].to_numpy(np.int64).astype(object)
    n = len(c)
    pre = np.cumsum(c)  # object -> exact
    tot = int(pre[-1])
    best = (-1, None)
    for i in range(min_seg, n - min_seg + 1):
        a, b = int(pre[i - 1]), tot - int(pre[i - 1])
        num = abs(a * (n - i) - b * i)
        den = i * (n - i)
        micro = (2 * num * 10_000 + den) // (2 * den)
        if micro > best[0]:
            best = (micro, i - 1)
    return pd.DataFrame({
        "split_day": days["day"].iloc[[best[1]]].reset_index(drop=True),
        "shift_micro": np.array([best[0]], np.int64),
    })


def conversion_latency_events(sf_dir: str) -> pd.DataFrame:
    """Funnel latency distribution (hours from each user's first view
    to their first STRICTLY LATER purchase, as an hour-bucket
    histogram): one user co-partition; first-view and
    first-qualifying-purchase reductions are two np.minimum.at passes,
    the whole-hour bucket is integer division, and the final reduce is
    bucket-sized."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        u = g["user_id"].to_numpy(np.int64)
        tus = series_ts_us(g["ts"]).to_numpy()
        et = g["event_type"].to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        gid = np.cumsum(new_user) - 1
        ngroups = int(gid[-1]) + 1 if len(g) else 0
        big = np.iinfo(np.int64).max
        fv = np.full(ngroups, big, np.int64)
        isv = et == "view"
        np.minimum.at(fv, gid[isv], tus[isv])
        fp = np.full(ngroups, big, np.int64)
        isp = (et == "purchase") & (tus > fv[gid])
        np.minimum.at(fp, gid[isp], tus[isp])
        okg = (fv < big) & (fp < big)
        lat = fp[okg] - fv[okg]
        bucket = lat // HOUR_US
        v, cnt = np.unique(bucket, return_counts=True)
        return pd.DataFrame({"bucket_h": v.astype(np.int64),
                             "n_users": cnt.astype(np.int64)})

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas()
           .groupby("bucket_h", sort=True)["n_users"].sum().reset_index())
    for c in ("bucket_h", "n_users"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def top1pct_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Revenue-concentration curve point (share of total revenue held
    by the top 1% of orders — Gini's headline-number sibling): the
    distinct-cents histogram reduces once; the top-k sum rewrites
    order-free over that frame as (everything strictly above the
    cutoff) + (k − count_above)·cutoff, which is invariant to how ties
    at the cutoff break — so no row sort and no arbitrary tie choice
    anywhere; exact integers into the shared half-away ppm."""
    ds = _t(sf_dir, "orders", ["o_totalprice"])

    _schema = pa.schema([("cents", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"cents": cents}).group_by("cents")
                .aggregate([([], "count_all")])
                .rename_columns(["cents", "n"]).cast(_schema))

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("cents").aggregate(Sum("n", alias_name="n"))
            .to_pandas().sort_values("cents", ascending=False)
            .reset_index(drop=True))
    vals = hist["cents"].to_numpy(np.int64).astype(object)
    cnt = hist["n"].to_numpy(np.int64).astype(object)
    cum = np.cumsum(cnt)
    n_total = int(cum[-1])
    tot = int((vals * cnt).sum())
    k = (n_total + 99) // 100
    i = int(np.searchsorted(cum, k))  # first (largest-cents) row with cum >= k
    cutoff = int(vals[i])
    above_cnt = int(cum[i - 1]) if i > 0 else 0
    above_sum = int((vals[:i] * cnt[:i]).sum())
    top_sum = above_sum + (k - above_cnt) * cutoff
    return pd.DataFrame({
        "k": np.array([k], np.int64),
        "cutoff_cents": np.array([cutoff], np.int64),
        "share_ppm": _ppm(np.array([top_sum], object),
                          np.array([tot], object)),
    })


def spike_events(sf_dir: str) -> pd.DataFrame:
    """Windowed-baseline spike alerting (events whose value exceeds 2x
    the mean of the user's OTHER trailing-day events, needing at least
    3 of them — the threshold-over-moving-baseline rule a streaming
    monitor fires on): reuses the composite-key searchsorted frame
    machinery of ``trailing_hour_sum_events`` for BOTH the trailing
    cent sum and the window count, then the alert compares
    cents·(n−1) > 2·(s−cents) in exact integers — no float mean, no
    boundary to disagree on."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        tus = series_ts_us(g["ts"]).to_numpy()
        c = np.round(g["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64)
        chg = np.ones(len(g), dtype=np.int64)
        chg[1:] = (u[1:] != u[:-1]).astype(np.int64)
        rank = np.cumsum(chg) - 1
        base = tus - tus.min()
        span = base.max() + DAY_US + 2
        assert (int(rank[-1]) + 1) * int(span) < 2 ** 63, (
            "user-rank x time-span exceeds int64; shard smaller or "
            "window the epoch")
        comp = rank * span + base
        left = np.searchsorted(comp, comp - DAY_US, side="left")
        right = np.searchsorted(comp, comp, side="right")
        cum = np.cumsum(c)
        s = cum[right - 1] - np.where(left > 0, cum[left - 1], 0)
        n = right - left
        spike = (n >= 4) & (c * (n - 1) > 2 * (s - c))
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64)[spike],
            "n_window": n[spike].astype(np.int64),
            "s_cents": s[spike].astype(np.int64)})

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def dwell_by_type_events(sf_dir: str) -> pd.DataFrame:
    """Semi-Markov dwell times (how long users linger on each action —
    every consecutive gap attributes to the EARLIER event's type,
    completing ``markov_transitions_events``'s transition probabilities
    with transition timing): one user co-partition, boundary-masked
    vectorized diffs, per-type (sum_us, n) partials, and the
    millisecond average divides exact integers half-away."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        tus = series_ts_us(g["ts"]).to_numpy()
        et = g["event_type"].to_numpy()
        has_next = np.append(u[1:] == u[:-1], False)
        d = np.append(np.diff(tus), 0)[has_next]
        return (pd.DataFrame({"event_type": et[has_next], "d": d})
                .groupby("event_type", sort=False)
                .agg(sum_us=("d", "sum"), n_gaps=("d", "size"))
                .reset_index())

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas()
           .groupby("event_type", sort=True)
           .agg(sum_us=("sum_us", "sum"), n_gaps=("n_gaps", "sum"))
           .reset_index())
    tot = out["sum_us"].to_numpy().astype(object)
    n = out["n_gaps"].to_numpy().astype(object)
    out["avg_dwell_ms"] = np.array(
        [(2 * int(t) + int(m) * 1000) // (2 * int(m) * 1000)
         for t, m in zip(tot, n)], np.int64)
    out["n_gaps"] = out["n_gaps"].astype("int64")
    return (out[["event_type", "n_gaps", "avg_dwell_ms"]]
            .reset_index(drop=True))


def fulfillment_lag_quantiles(sf_dir: str) -> pd.DataFrame:
    """Order-to-first-ship lag QUANTILES per priority (p50/p90 tail
    view of ``fulfillment_lag_by_priority``'s means): reads the shared
    co-partitioned lag histogram (`_fulfillment_lag_hist`) and the
    inverted-CDF rule reads both quantiles off that tiny frame."""
    hist = _fulfillment_lag_hist(sf_dir)
    rows = []
    for prio, sub in hist.groupby("o_orderpriority"):
        sub = sub.sort_values("days")
        vals = sub["days"].to_numpy(np.int64)
        cum = sub["n"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        p50 = int(vals[np.searchsorted(cum, (n + 1) // 2)])
        p90 = int(vals[np.searchsorted(cum, (9 * n + 9) // 10)])
        rows.append((prio, p50, p90))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "p50_days",
                                      "p90_days"])
    for c in ("p50_days", "p90_days"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def dim_stats_embeddings(sf_dir: str) -> pd.DataFrame:
    """Per-dimension feature statistics over the embedding column (the
    feature-wise mean/std a normalizer or whitening step needs):
    positional list explode happens INSIDE each block as one reshape —
    elements e6-quantize first (the ``embedding_norms`` rule), the
    per-dim (n, Σq, Σq²) partials are three numpy column sums, and the
    dims-sized reduce carries 64 rows per block; moments sum as
    arbitrary-precision ints (HUGEINT in the oracle) and each output is
    ONE identical float expression over exact integers, floored to a
    micro-unit int (a round-to-6 output sat ON .5e-6 boundaries when
    n divides the sum evenly — caught by the fuzz harness — so the
    boundary rule is now the shared floor(x + 0.5))."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"dim": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "sq": pd.Series([], dtype=object),
                                 "sqq": pd.Series([], dtype=object)})
        m = np.stack(df["embedding"].to_numpy())  # rows x dim
        q = np.floor(m.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        qo = q.astype(object)
        return pd.DataFrame({
            "dim": np.arange(1, q.shape[1] + 1, dtype=np.int64),
            "n": np.full(q.shape[1], q.shape[0], np.int64),
            "sq": qo.sum(axis=0), "sqq": (qo * qo).sum(axis=0)})

    parts = (ds.map_batches(partial, batch_format="pandas").to_pandas()
             .groupby("dim", sort=True)
             .agg(n=("n", "sum"), sq=("sq", "sum"), sqq=("sqq", "sum"))
             .reset_index())
    n = parts["n"].to_numpy().astype(object)
    sq = parts["sq"].to_numpy()
    sqq = parts["sqq"].to_numpy()
    mean_q = [int(np.floor(float(int(s)) / int(m) + 0.5))
              for s, m in zip(sq, n)]
    std_q = [int(np.floor(
        float(np.sqrt(float(int(m) * int(ss) - int(s) * int(s))))
        / int(m) + 0.5)) for s, ss, m in zip(sq, sqq, n)]
    return pd.DataFrame({"dim": parts["dim"].astype("int64"),
                         "n": parts["n"].astype("int64"),
                         "mean_q": np.array(mean_q, np.int64),
                         "std_q": np.array(std_q, np.int64)})


def gapfill_daily_revenue(sf_dir: str) -> pd.DataFrame:
    """LOCF gap fill (complete the daily revenue series over the full
    calendar, carrying the last observed value forward — the as-of
    semantics DuckDB spells ASOF JOIN): the corpus reduces to its
    days-sized integer frame, the calendar expands and fills with one
    searchsorted pass on that reduced frame, and a ``filled`` flag
    marks carried rows."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    _schema = pa.schema([("day", pa.timestamp("us")), ("cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        day = pc.cast(pc.floor_temporal(
            pc.cast(t["o_orderdate"], pa.timestamp("us")), unit="day"),
            pa.timestamp("us"))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"day": day, "cents": cents})
                .group_by("day").aggregate([("cents", "sum")])
                .rename_columns(["day", "cents"]).cast(_schema))

    days = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("cents", alias_name="cents"))
            .to_pandas().sort_values("day").reset_index(drop=True))
    d_us = series_ts_us(days["day"]).to_numpy()
    cents = days["cents"].to_numpy(np.int64)
    day_us = 86_400 * US
    cal = np.arange(d_us[0], d_us[-1] + day_us, day_us)
    src = np.searchsorted(d_us, cal, side="right") - 1
    filled = d_us[src] != cal
    return pd.DataFrame({
        "day": us_to_timestamp_array(cal),
        "revenue": cents[src].astype(np.float64) / 100.0,
        "filled": filled.astype(np.int64),
    })


def mannwhitney_purchase_view(sf_dir: str) -> pd.DataFrame:
    """Mann-Whitney U / Cliff's delta (nonparametric do-purchases-run-
    higher-than-views test on event values): both sides reduce to
    distinct-cents histograms, the rank statistic rewrites exactly over
    the histogram cross as 2U = Σ n_p·n_v·(2·[p>v] + [p=v]) — integer
    arithmetic, tie-exact, no row sort — and the effect size ships as
    exact half-away ppm (a rational round-6 double can sit ON a .5e-6
    boundary; same hardening as ``dim_stats_embeddings``). The histogram cross is
    value-domain-sized; at wider domains the merge-scan form (sorted
    cumulative counts) replaces it without changing the output."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    _schema = pa.schema([("event_type", pa.string()),
                         ("cents", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["event_type"],
                        value_set=pa.array(["purchase", "view"]))
        t = t.filter(mask)
        if len(t) == 0:
            return _schema.empty_table()
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        return (pa.table({"event_type": t["event_type"], "cents": cents})
                .group_by(["event_type", "cents"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "cents", "n"])
                .cast(_schema))

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n")).to_pandas())
    p = hist[hist["event_type"] == "purchase"].sort_values("cents")
    v = hist[hist["event_type"] == "view"].sort_values("cents")
    pv, pn = p["cents"].to_numpy(np.int64), p["n"].to_numpy(np.int64)
    vv, vn = v["cents"].to_numpy(np.int64), v["n"].to_numpy(np.int64)
    vcum = np.concatenate([[0], np.cumsum(vn)])
    less = vcum[np.searchsorted(vv, pv, side="left")]
    upto = vcum[np.searchsorted(vv, pv, side="right")]
    ties = upto - less
    u2 = int((pn.astype(object) * (2 * less.astype(object)
                                   + ties.astype(object))).sum())
    n1, n2 = int(pn.sum()), int(vn.sum())
    delta_ppm = int(_ppm(np.array([u2 - n1 * n2], object),
                         np.array([n1 * n2], object))[0])
    return pd.DataFrame({"u2": np.array([u2], np.int64),
                         "n1": np.array([n1], np.int64),
                         "n2": np.array([n2], np.int64),
                         "delta_ppm": np.array([delta_ppm], np.int64)})


def rolling7_active_users(sf_dir: str) -> pd.DataFrame:
    """Sliding-window distinct count (7-day rolling active users per
    day — the DAU/WAU family's hard member, since distinct does not
    decompose over overlapping windows): each user's distinct active
    days, the ≤7-day window fan-out AND the window-level dedup all
    finish INSIDE one user co-partition (a user lives in exactly one
    of 32 shards, so shard-local distinct IS global distinct — the
    pair-domain-sized groupby a first cut shuffled was priced by its
    group count, the same lesson as ``top_parts_in_top_nations``);
    each shard emits (wday, partial count) rows and the final reduce
    is days-sized. Window ends clamp to the observed day range."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])
    day_us = 86_400 * US

    def sharded(t: pa.Table) -> pa.Table:
        day = (np.asarray(column_ts_us(t["ts"])) // day_us) * day_us
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return (pa.table({"user_id": t["user_id"],
                          "day_us": pa.array(day), "_shard": shard})
                .group_by(["user_id", "day_us", "_shard"]).aggregate([]))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        pairs = g.drop_duplicates(["user_id", "day_us"])
        u = pairs["user_id"].to_numpy(np.int64)
        d = pairs["day_us"].to_numpy(np.int64)
        offs = np.arange(7, dtype=np.int64) * day_us
        w = pd.DataFrame({
            "user_id": np.repeat(u, 7),
            "wday_us": (d[:, None] + offs[None, :]).ravel(),
        }).drop_duplicates()
        out = (w.groupby("wday_us", sort=False).size()
               .reset_index(name="n"))
        out["last_day"] = d.max()
        return out

    win = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    hi = int(win["last_day"].max())  # last OBSERVED day, any shard
    out = (win[win["wday_us"] <= hi]
           .groupby("wday_us", sort=True)["n"].sum()
           .reset_index(name="active7"))
    return pd.DataFrame({
        "wday": us_to_timestamp_array(out["wday_us"].to_numpy(np.int64)),
        "active7": out["active7"].astype("int64"),
    })


def common_journeys(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Journey mining (the most common 5-step entry paths across
    users): the first-k prefix masks out of each sorted user group with
    pure index arithmetic, paths join per shard and pre-count, and the
    global reduce carries (path, count) rows only — top-20 by count
    then path."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        gid = np.cumsum(new_user) - 1
        starts = np.flatnonzero(new_user)
        rn = np.arange(len(g)) - starts[gid]
        head = rn < k
        f = pd.DataFrame({"gid": gid[head],
                          "et": g["event_type"].to_numpy()[head]})
        paths = f.groupby("gid", sort=False)["et"].agg(">".join)
        return (paths.value_counts().rename_axis("path")
                .reset_index(name="n_users"))

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas()
           .groupby("path", sort=True)["n_users"].sum().reset_index())
    out = out.sort_values(["n_users", "path"],
                          ascending=[False, True]).head(20)
    out["n_users"] = out["n_users"].astype("int64")
    return out.reset_index(drop=True)


def fano_burstiness_types(sf_dir: str) -> pd.DataFrame:
    """Traffic burstiness (Fano factor var/mean of per-hour event
    counts, zero hours included — Poisson traffic scores 1, bursty
    traffic higher): per-(type, hour) counts reduce once, the global
    hour span H comes from the same frame, and the dispersion
    (H·Σc² − n²)/(n·H) ships as exact half-away ppm — zero-count
    hours enter through H without materializing."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    _schema = pa.schema([("event_type", pa.string()), ("h", pa.int64()),
                         ("c", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        h = np.asarray(column_ts_us(t["ts"])) // HOUR_US
        return (pa.table({"event_type": t["event_type"],
                          "h": pa.array(h)})
                .group_by(["event_type", "h"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "h", "c"]).cast(_schema))

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "h"]).aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    H = int(hist["h"].max() - hist["h"].min() + 1)
    g = (hist.assign(cc=lambda d: d["c"].astype(object) ** 2)
         .groupby("event_type", sort=True)
         .agg(n=("c", "sum"), scc=("cc", "sum")).reset_index())
    fano = _ppm(
        np.array([int(H) * int(scc) - int(n) * int(n)
                  for n, scc in zip(g["n"], g["scc"])], object),
        np.array([int(n) * int(H) for n in g["n"]], object))
    return pd.DataFrame({"event_type": g["event_type"],
                         "n": g["n"].astype("int64"),
                         "fano_ppm": fano})


def rank_movers_parts(sf_dir: str) -> pd.DataFrame:
    """Rank-delta movers (which parts climbed the revenue leaderboard
    between the first and second half of the ship-date range): the
    corpus reduces to per-(half, part) integer-cent partials — the
    half is pure date arithmetic on a broadcast split point — ranks
    assign deterministically (revenue desc, key asc) on the parts-sized
    frame, and the movers report needs parts present in BOTH halves.
    Top-10 by rank gain then key."""
    ds = _t(sf_dir, "lineitem", ["l_partkey", "l_shipdate",
                                 "l_extendedprice"])
    day_us = 86_400 * US
    agg = ds.aggregate(Min("l_shipdate"), Max("l_shipdate"))
    lo, hi = [pd.Timestamp(v).value // 1000 for v in
              (agg["min(l_shipdate)"], agg["max(l_shipdate)"])]
    split_day = (lo // day_us + ((hi - lo) // day_us + 2) // 2)
    split_us = split_day * day_us

    _schema = pa.schema([("half", pa.int64()), ("l_partkey", pa.int64()),
                         ("cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        sd = np.asarray(column_ts_us(t["l_shipdate"]))
        half = (sd >= split_us).astype(np.int64) + 1
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
        return (pa.table({"half": pa.array(half),
                          "l_partkey": t["l_partkey"], "cents": cents})
                .group_by(["half", "l_partkey"])
                .aggregate([("cents", "sum")])
                .rename_columns(["half", "l_partkey", "cents"])
                .cast(_schema))

    # parts is a DIMENSION: blocks x (2 x |parts|) pre-reduced partials
    # merge on the driver (the `zscore_events` shape) — a Ray all-to-all
    # groupby over the 2x-parts group domain cost 5-7 s at sf0.1 for
    # what this merge does in ~0.3 s
    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas()
             .groupby(["half", "l_partkey"], as_index=False)["cents"]
             .sum())

    def ranked(h: int) -> pd.DataFrame:
        sub = parts[parts["half"] == h].sort_values(
            ["cents", "l_partkey"], ascending=[False, True])
        sub = sub.assign(rank=np.arange(1, len(sub) + 1, dtype=np.int64))
        return sub[["l_partkey", "rank"]]

    m = ranked(1).merge(ranked(2), on="l_partkey",
                        suffixes=("_h1", "_h2"))
    m["gain"] = m["rank_h1"] - m["rank_h2"]
    m = m.sort_values(["gain", "l_partkey"],
                      ascending=[False, True]).head(10)
    for c in ("l_partkey", "rank_h1", "rank_h2", "gain"):
        m[c] = m[c].astype("int64")
    return m.reset_index(drop=True)


def timed_funnel_events(sf_dir: str, step_s: int = 86_400) -> pd.DataFrame:
    """Time-constrained strict-sequence funnel (signup → view →
    purchase, each stage within 24 h of the previous stage's earliest
    completion — the CEP pattern ``funnel_events`` relaxes): per-user
    stage times chain through three np.minimum.at reductions inside one
    user co-partition (stage k+1's candidate set depends on stage k's
    result, so the chain is sequential but each link is vectorized);
    the output is one stage-counts row."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    step_us = step_s * US

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        u = g["user_id"].to_numpy(np.int64)
        tus = series_ts_us(g["ts"]).to_numpy()
        et = g["event_type"].to_numpy()
        new_user = np.ones(len(g), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        gid = np.cumsum(new_user) - 1
        ngroups = int(gid[-1]) + 1 if len(g) else 0
        big = np.iinfo(np.int64).max

        def stage(name: str, after: np.ndarray) -> np.ndarray:
            t_k = np.full(ngroups, big, np.int64)
            # cap: no overflow — `after` is big for unreached users, so
            # gate on after<big before adding the step window
            ok = ((et == name) & (after[gid] < big)
                  & (tus > after[gid])
                  & (tus <= after[gid] + step_us))
            np.minimum.at(t_k, gid[ok], tus[ok])
            return t_k

        f1 = np.full(ngroups, big, np.int64)
        s1 = et == "signup"
        np.minimum.at(f1, gid[s1], tus[s1])
        f2 = stage("view", f1)
        f3 = stage("purchase", f2)
        return pd.DataFrame({
            "n_stage1": [int((f1 < big).sum())],
            "n_stage2": [int((f2 < big).sum())],
            "n_stage3": [int((f3 < big).sum())]})

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas().sum())
    return pd.DataFrame({
        "n_stage1": np.array([out["n_stage1"]], np.int64),
        "n_stage2": np.array([out["n_stage2"]], np.int64),
        "n_stage3": np.array([out["n_stage3"]], np.int64)})


def k_anonymity_audit_events(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """K-anonymity audit over quasi-identifiers (event_type x
    hour-of-day x day-of-week — the privacy re-identification check a
    release pipeline runs): group sizes reduce to the
    quasi-identifier-domain-sized frame (|types|·24·7 max), then the
    minimum class size and the count of classes below k read that tiny
    frame. Locale-free dow via epoch-day arithmetic."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    _schema = pa.schema([("event_type", pa.string()), ("h", pa.int64()),
                         ("dow", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        tus = np.asarray(column_ts_us(t["ts"]))
        h = (tus // HOUR_US) % 24
        dow = (tus // DAY_US + 4) % 7
        return (pa.table({"event_type": t["event_type"],
                          "h": pa.array(h), "dow": pa.array(dow)})
                .group_by(["event_type", "h", "dow"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "h", "dow", "n"])
                .cast(_schema))

    sizes = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["event_type", "h", "dow"])
             .aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    n = sizes["n"].to_numpy(np.int64)
    return pd.DataFrame({
        "n_classes": np.array([len(sizes)], np.int64),
        "min_size": np.array([int(n.min())], np.int64),
        "n_below_k": np.array([int((n < k).sum())], np.int64)})


def partition_skew_events(sf_dir: str, parts: int = 32) -> pd.DataFrame:
    """Shuffle-skew forecaster (what load each of 32 hash partitions
    would carry if the corpus shuffled on user_id — the capacity-
    planning audit run BEFORE committing to a partition key): rows
    pre-count per (block, partition) with the engine's SQL-mirrorable
    Knuth multiplicative hash (``stages/hashing.py:
    multiplicative_hash_u32``), so the reduce carries parts-sized
    partials; shares ship as exact half-away ppm."""
    from ..stages.hashing import multiplicative_hash_u32

    ds = _t(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        p = (multiplicative_hash_u32(u) % np.uint64(parts)).astype(np.int64)
        return (pa.table({"partition": pa.array(p)})
                .group_by("partition").aggregate([([], "count_all")])
                .rename_columns(["partition", "n"]))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("partition").aggregate(Sum("n", alias_name="n"))
           .to_pandas().sort_values("partition").reset_index(drop=True))
    total = int(out["n"].sum())
    out["share_ppm"] = _ppm(out["n"].to_numpy(np.int64).astype(object),
                            np.array([total] * len(out), object))
    for c in ("partition", "n"):
        out[c] = out[c].astype("int64")
    return out


def top_parts_in_top_nations(sf_dir: str) -> pd.DataFrame:
    """Nested top-k (the top-3 revenue parts WITHIN each of the top-5
    revenue nations — a drill-down leaderboard): lineitem x orders is
    the large-large partitioned hash join (integer keys only), the
    customer->nationkey map broadcasts, and the reduce co-partitions
    by NATION (25 groups) rather than by (nation, part) — a groupby
    over the ~rows-sized (nation, part) domain cost 21-24 s at sf0.1
    because the group count, not the key dtype, priced the shuffle;
    each nation task owns every row of its nation, so the per-part
    sums, the nation total and the top-3 selection all finish inside
    the group task and only (25 x 3)-sized results reach the driver.
    Both rank levels keep key-ordered ties."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    dim = cust[["c_custkey", "c_nationkey"]].rename(
        columns={"c_custkey": "o_custkey"})
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey",
                                 "l_extendedprice"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_partkey",
                                    "l_extendedprice"]),
        batch_format="pyarrow")
    buckets = join_buckets(_tbytes(sf_dir, "orders", "lineitem"))
    joined = broadcast_join(
        hash_join(li, orders, on="o_orderkey", how="inner",
                  buckets=buckets),
        dim, on="o_custkey", how="inner", concurrency=8)

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
        return (pa.table({"_nk": pc.cast(t["c_nationkey"], pa.int64()),
                          "l_partkey": t["l_partkey"], "cents": cents})
                .group_by(["_nk", "l_partkey"])
                .aggregate([("cents", "sum")])
                .rename_columns(["_nk", "l_partkey", "cents"]))

    def per_nation(g: pd.DataFrame) -> pd.DataFrame:
        sums = (g.groupby("l_partkey", sort=False)["cents"].sum()
                .reset_index())
        sums = sums.sort_values(["cents", "l_partkey"],
                                ascending=[False, True]).head(3)
        sums["part_rank"] = np.arange(1, len(sums) + 1, dtype=np.int64)
        sums["_nk"] = np.int64(g["_nk"].iloc[0])
        sums["ncents"] = np.int64(g["cents"].sum())
        return sums

    top = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby("_nk").map_groups(per_nation, batch_format="pandas")
           .to_pandas())
    top["n_name"] = top["_nk"].map(
        dict(zip(nat["n_nationkey"], nat["n_name"])))
    nat_rev = (top[["n_name", "ncents"]].drop_duplicates()
               .sort_values(["ncents", "n_name"],
                            ascending=[False, True]).head(5))
    top = top[top["n_name"].isin(nat_rev["n_name"])]
    top["revenue"] = top.pop("cents").to_numpy(np.float64) / 100.0
    top["l_partkey"] = top["l_partkey"].astype("int64")
    top["part_rank"] = top["part_rank"].astype("int64")
    return (top.sort_values(["n_name", "part_rank"])
            [["n_name", "part_rank", "l_partkey", "revenue"]]
            .reset_index(drop=True))


def ship_lag_matrix(sf_dir: str) -> pd.DataFrame:
    """Bi-temporal lag matrix (orders placed in month M shipping after
    K whole months — the fulfillment heatmap a logistics dashboard
    draws): the large-large join reuses the partitioned hash-join
    shape, calendar months come from Arrow temporal kernels, and the
    (month x lag)-sized count matrix is the only thing shuffled."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_shipdate"]),
        batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    buckets = join_buckets(_tbytes(sf_dir, "orders", "lineitem"))
    joined = hash_join(li, orders, on="o_orderkey", how="inner",
                       buckets=buckets)

    _schema = pa.schema([("order_month", pa.timestamp("us")),
                         ("lag_months", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        od = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        sd = pc.cast(t["l_shipdate"], pa.timestamp("us"))
        month = pc.cast(pc.floor_temporal(od, unit="month"),
                        pa.timestamp("us"))
        lag = pc.subtract(
            pc.add(pc.multiply(pc.year(sd), 12), pc.month(sd)),
            pc.add(pc.multiply(pc.year(od), 12), pc.month(od)))
        return (pa.table({"order_month": month,
                          "lag_months": pc.cast(lag, pa.int64())})
                .group_by(["order_month", "lag_months"])
                .aggregate([([], "count_all")])
                .rename_columns(["order_month", "lag_months", "n"])
                .cast(_schema))

    out = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby(["order_month", "lag_months"])
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas()
           .sort_values(["order_month", "lag_months"])
           .reset_index(drop=True))
    for c in ("lag_months", "n"):
        out[c] = out[c].astype("int64")
    return out


def rolling_median_daily(sf_dir: str, w: int = 7) -> pd.DataFrame:
    """Rolling MEDIAN over the daily revenue series (order statistics
    in a sliding frame — algorithmically unlike the rolling mean/std,
    which decompose into moment sums; the median does not, so each
    full 7-day window sorts): the corpus reduces to the days-sized
    integer frame once, then one sliding_window_view + per-window sort
    runs on that reduced frame. Odd window → the middle element is an
    exact integer on both engines; only full windows emit."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    _schema = pa.schema([("day", pa.timestamp("us")), ("cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        day = pc.cast(pc.floor_temporal(
            pc.cast(t["o_orderdate"], pa.timestamp("us")), unit="day"),
            pa.timestamp("us"))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"day": day, "cents": cents})
                .group_by("day").aggregate([("cents", "sum")])
                .rename_columns(["day", "cents"]).cast(_schema))

    days = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("cents", alias_name="cents"))
            .to_pandas().sort_values("day").reset_index(drop=True))
    c = days["cents"].to_numpy(np.int64)
    win = np.lib.stride_tricks.sliding_window_view(c, w)
    med = np.sort(win, axis=1)[:, w // 2]
    return pd.DataFrame({
        "day": days["day"].iloc[w - 1:].reset_index(drop=True),
        "med7": med.astype(np.float64),
    })


def merge_upsert_documents(sf_dir: str) -> pd.DataFrame:
    """CDC MERGE apply (upsert a change feed into a base snapshot with
    deletes — the Delta/Hudi-style 'MERGE INTO' a lakehouse compaction
    runs): the deterministic change feed derives from the corpus
    itself (doc_id%7 rows get a ' v2' text suffix, doc_id%13 rows are
    deletes), updates apply through a partitioned hash LEFT join —
    both sides scale with the corpus, no broadcast — and the delete
    anti-join broadcasts its key set (``semi_join(anti=True)``). Output
    is the post-merge per-doc length + changed flag."""
    base = _t(sf_dir, "documents", ["doc_id", "text"])

    def mod_mask(col: pa.ChunkedArray, m: int):
        return pc.equal(
            pc.subtract(col, pc.multiply(pc.divide(col, m), m)), 0)

    def make_updates(t: pa.Table) -> pa.Table:
        t = t.filter(mod_mask(t["doc_id"], 7))
        return pa.table({
            "doc_id": t["doc_id"],
            "new_text": pc.binary_join_element_wise(t["text"], " v2", "")})

    def make_deletes(t: pa.Table) -> pa.Table:
        return t.filter(mod_mask(t["doc_id"], 13))

    upd = (_t(sf_dir, "documents", ["doc_id", "text"])
           .map_batches(make_updates, batch_format="pyarrow"))
    del_keys = (_t(sf_dir, "documents", ["doc_id"])
                .map_batches(make_deletes, batch_format="pyarrow")
                .to_pandas()["doc_id"].to_numpy(np.int64))
    buckets = join_buckets(_tbytes(sf_dir, "documents") * 2)
    merged = hash_join(base, upd, on="doc_id", how="left",
                       buckets=buckets)
    alive = semi_join(merged, list(del_keys), "doc_id", anti=True)

    def finish(t: pa.Table) -> pa.Table:
        new = t["new_text"]
        final = pc.if_else(pc.is_valid(new), new, t["text"])
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars_final": pc.cast(pc.utf8_length(final), pa.int64()),
            "changed": pc.cast(pc.is_valid(new), pa.int64())})

    out = alive.map_batches(finish, batch_format="pyarrow").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def denormalized_star_checksum(sf_dir: str) -> pd.DataFrame:
    """Star-schema denormalization audit (build the fully-joined wide
    line table — lineitem x orders x customer x nation x region x part
    x supplier — and certify it with per-region reconciliation
    checksums, the ETL acceptance test a warehouse migration runs):
    the ONE large-large edge (lineitem x orders) goes through the
    partitioned hash join; every dimension chain broadcasts (customer
    -> nation -> region collapses to one custkey map, part and supplier
    ship as key->cents dicts); a composite line id (orderkey·8 +
    linenumber) XOR-folds DISTRIBUTED via the custom AggregateFn, so
    the driver sees only the regions-sized frame."""
    from ray.data.aggregate import AggregateFn

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _t(sf_dir, "region").to_pandas()
    dim = (cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
           .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
           [["c_custkey", "r_name"]].rename(
               columns={"c_custkey": "o_custkey"}))
    part = _t(sf_dir, "part", ["p_partkey", "p_retailprice"]).to_pandas()
    part_cents = dict(zip(
        part["p_partkey"].to_numpy(np.int64),
        np.round(part["p_retailprice"].to_numpy(np.float64)
                 * 100.0).astype(np.int64)))
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).to_pandas()
    supp_cents = dict(zip(
        supp["s_suppkey"].to_numpy(np.int64),
        np.round(supp["s_acctbal"].to_numpy(np.float64)
                 * 100.0).astype(np.int64)))
    part_ref, supp_ref = ray.put(part_cents), ray.put(supp_cents)

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber",
                                 "l_partkey", "l_suppkey",
                                 "l_extendedprice"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_linenumber",
                                    "l_partkey", "l_suppkey",
                                    "l_extendedprice"]),
        batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    buckets = join_buckets(_tbytes(sf_dir, "orders", "lineitem"))
    joined = hash_join(li, orders, on="o_orderkey", how="inner",
                       buckets=buckets)
    wide = broadcast_join(joined, dim, on="o_custkey", how="inner",
                          concurrency=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pc_map, sc_map = ray.get(part_ref), ray.get(supp_ref)
        line_id = (df["o_orderkey"].to_numpy(np.int64) * 8
                   + df["l_linenumber"].to_numpy(np.int64))
        rev = np.round(df["l_extendedprice"].to_numpy(np.float64)
                       * 100.0).astype(np.int64)
        retail = (pd.Series(df["l_partkey"].to_numpy(np.int64))
                  .map(pc_map).to_numpy(np.int64))
        sbal = (pd.Series(df["l_suppkey"].to_numpy(np.int64))
                .map(sc_map).to_numpy(np.int64))
        g = pd.DataFrame({"r_name": df["r_name"], "lid": line_id,
                          "rev": rev, "retail": retail, "sbal": sbal})
        return (g.groupby("r_name", sort=False)
                .agg(n=("lid", "size"),
                     xor=("lid", lambda s: np.bitwise_xor.reduce(
                         s.to_numpy(np.int64))),
                     rev=("rev", "sum"), retail=("retail", "sum"),
                     sbal=("sbal", "sum"))
                .reset_index())

    def _xor_block(a: int, blk) -> int:
        v = (blk["xor"].to_numpy(np.int64) if isinstance(blk, pd.DataFrame)
             else blk["xor"].to_numpy(zero_copy_only=False))
        return a ^ int(np.bitwise_xor.reduce(v))

    xor_fold = AggregateFn(init=lambda k: 0, merge=lambda a, b: a ^ b,
                           accumulate_block=_xor_block, name="line_xor")
    out = (wide.map_batches(partial, batch_format="pandas")
           .groupby("r_name")
           .aggregate(xor_fold, Sum("n", alias_name="n_rows"),
                      Sum("rev", alias_name="rev_cents"),
                      Sum("retail", alias_name="retail_cents"),
                      Sum("sbal", alias_name="sbal_cents"))
           .to_pandas())
    for c in ("line_xor", "n_rows", "rev_cents", "retail_cents",
              "sbal_cents"):
        out[c] = out[c].astype("int64")
    return (out.sort_values("r_name").reset_index(drop=True)
            [["r_name", "n_rows", "line_xor", "rev_cents",
              "retail_cents", "sbal_cents"]])


def equidepth_bins_totalprice(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Equi-depth (quantile) binning — the feature-engineering
    discretizer that gives each bin ~equal mass, unlike
    ``value_histogram_events``'s equal WIDTH: bin edges are inverted-
    CDF quantiles at i/k read off the distinct-cents histogram, and
    the per-bin counts are cumulative-count differences at the edges —
    one histogram reduce, no row sort; heavy ties make bins uneven by
    exactly the amount both engines agree on."""
    ds = _t(sf_dir, "orders", ["o_totalprice"])

    _schema = pa.schema([("cents", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"cents": cents}).group_by("cents")
                .aggregate([([], "count_all")])
                .rename_columns(["cents", "n"]).cast(_schema))

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("cents").aggregate(Sum("n", alias_name="n"))
            .to_pandas().sort_values("cents").reset_index(drop=True))
    vals = hist["cents"].to_numpy(np.int64)
    cum = hist["n"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    edges = np.array([int(vals[np.searchsorted(
        cum, (i * n + k - 1) // k)]) for i in range(1, k + 1)], np.int64)
    # count of values <= edge, via the cumulative histogram
    le = cum[np.searchsorted(vals, edges, side="right") - 1]
    counts = np.diff(np.concatenate([[0], le]))
    return pd.DataFrame({
        "bin": np.arange(1, k + 1, dtype=np.int64),
        "hi_cents": edges,
        "n": counts.astype(np.int64)})


def random_projection_embeddings(sf_dir: str, k: int = 8,
                                 seed: int = 12345) -> pd.DataFrame:
    """Johnson-Lindenstrauss random projection (seeded sign matrix,
    ±1/√k entries — the training-free dimensionality reducer an ANN
    or dedup pipeline runs before indexing): the projection matrix is
    built ONCE from the pinned seed, ships via ``ray.put`` and every
    batch is one matmul — a pure map, zero shuffles, layout-invariant
    because the matrix is a function of (seed, dim) only. Rows-only
    (no ANSI-SQL oracle for a seeded matmul); pinned by
    ``test_random_projection.py`` (distance-distortion bound, exact
    layout invariance, determinism across sessions)."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    dim = len(ds.take(1)[0]["embedding"])
    rng = np.random.default_rng(seed)
    proj = (rng.integers(0, 2, (dim, k)).astype(np.float64) * 2.0
            - 1.0) / np.sqrt(k)
    proj_ref = ray.put(proj)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(proj_ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        out = m @ p
        res = pd.DataFrame({"vec_id": df["vec_id"].to_numpy(np.int64)})
        for j in range(out.shape[1]):
            res[f"p{j + 1}"] = np.round(out[:, j], 6)
        return res

    out = ds.map_batches(fn, batch_format="pandas").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def brand_name_lcp(sf_dir: str) -> pd.DataFrame:
    """Mergeable string aggregate (the longest common prefix of every
    part name within a brand — the namespace-discovery scan a catalog
    normalizer runs): LCP over a set equals LCP(lexicographic min,
    lexicographic max), so the whole reduction rides two plain Min/Max
    string aggregates — per-block partials, one brands-sized shuffle —
    and the single pairwise LCP runs on the reduced frame. The oracle
    mirrors min/max + a position-probe subquery."""
    ds = _t(sf_dir, "part", ["p_brand", "p_name"])

    def partial(t: pa.Table) -> pa.Table:
        return (pa.table({"p_brand": t["p_brand"], "name": t["p_name"]})
                .group_by("p_brand")
                .aggregate([("name", "min"), ("name", "max")])
                .rename_columns(["p_brand", "mn", "mx"]))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("p_brand")
           .aggregate(Min("mn", alias_name="mn"),
                      Max("mx", alias_name="mx"))
           .to_pandas())

    def lcp(a: str, b: str) -> str:
        i = 0
        m = min(len(a), len(b))
        while i < m and a[i] == b[i]:
            i += 1
        return a[:i]

    out["prefix"] = [lcp(a, b) for a, b in zip(out["mn"], out["mx"])]
    out["prefix_len"] = out["prefix"].str.len().astype("int64")
    return (out[["p_brand", "prefix", "prefix_len"]]
            .sort_values("p_brand").reset_index(drop=True))


def capped_contribution_counts(sf_dir: str, cap: int = 10) -> pd.DataFrame:
    """Bounded-influence aggregation (per-type event counts where each
    user contributes AT MOST ``cap`` events — the contribution-capping
    step differential-privacy and abuse-resistant metrics pipelines
    apply before any release): per-(user, type) counts finish inside
    one 32-shard user co-partition (shard-local counts are global —
    the user lives in one shard), the min(count, cap) clamps there
    too, and the final reduce is alphabet-sized. The uncapped count
    rides along so the clamped mass is visible."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return (pa.table({"user_id": t["user_id"],
                          "event_type": t["event_type"],
                          "_shard": shard})
                .group_by(["user_id", "event_type", "_shard"])
                .aggregate([([], "count_all")])
                .rename_columns(["user_id", "event_type", "_shard", "n"]))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        cnt = (g.groupby(["user_id", "event_type"], sort=False)["n"]
               .sum().reset_index())
        cnt["capped"] = np.minimum(cnt["n"].to_numpy(np.int64), cap)
        return (cnt.groupby("event_type", sort=False)
                .agg(n_events=("n", "sum"), n_capped=("capped", "sum"))
                .reset_index())

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas()
           .groupby("event_type", sort=True)
           .agg(n_events=("n_events", "sum"),
                n_capped=("n_capped", "sum")).reset_index())
    for c in ("n_events", "n_capped"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def record_highs_events(sf_dir: str) -> pd.DataFrame:
    """Running-record detection (events that set a new all-time value
    high for their type — the leaderboard-breaker feed): a running max
    is order-dependent, so it runs TWO-LEVEL like the sweep-line — a
    (type, day) max reduce first, the driver takes the exclusive
    cumulative max over that days-sized frame, and each (type, day)
    group task replays only its own day against the broadcast
    prior-day high (shifted prefix-max inside the day). A record is
    the first event strictly above everything before it; the first
    event of a type is a record by definition."""
    ds = _t(sf_dir, "events", ["event_id", "event_type", "ts", "value"])
    day_us = 86_400 * US

    _schema = pa.schema([("event_type", pa.string()),
                         ("day_us", pa.int64()), ("mx", pa.int64())])

    def day_max(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        day = (np.asarray(column_ts_us(t["ts"])) // day_us) * day_us
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        return (pa.table({"event_type": t["event_type"],
                          "day_us": pa.array(day), "mx": cents})
                .group_by(["event_type", "day_us"])
                .aggregate([("mx", "max")])
                .rename_columns(["event_type", "day_us", "mx"])
                .cast(_schema))

    days = (ds.map_batches(day_max, batch_format="pyarrow")
            .groupby(["event_type", "day_us"])
            .aggregate(Max("mx", alias_name="mx"))
            .to_pandas().sort_values(["event_type", "day_us"]))
    lo = np.iinfo(np.int64).min
    prior = {}
    for et, sub in days.groupby("event_type"):
        mx = sub["mx"].to_numpy(np.int64)
        run = np.concatenate([[lo], np.maximum.accumulate(mx)[:-1]])
        for d, p in zip(sub["day_us"].to_numpy(np.int64), run):
            prior[(et, int(d))] = int(p)
    prior_ref = ray.put(prior)

    def keyed(t: pa.Table) -> pa.Table:
        day = (np.asarray(column_ts_us(t["ts"])) // day_us) * day_us
        return t.append_column("_day", pa.array(day))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(prior_ref)[(g["event_type"].iloc[0],
                                int(g["_day"].iloc[0]))]
        g = g.sort_values(["ts", "event_id"])
        cents = np.round(g["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64)
        prev = np.maximum(
            np.concatenate([[lo], np.maximum.accumulate(cents)[:-1]]), p)
        rec = cents > prev
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64)[rec],
            "event_type": g["event_type"].to_numpy()[rec],
            "cents": cents[rec]})

    out = (ds.map_batches(keyed, batch_format="pyarrow")
           .groupby(["event_type", "_day"])
           .map_groups(per_group, batch_format="pandas")
           .to_pandas())
    out["event_id"] = out["event_id"].astype("int64")
    out["cents"] = out["cents"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def state_at_probes_events(sf_dir: str) -> pd.DataFrame:
    """Point-in-time state read (each user's current state at three
    probe instants — the temporal-table 'AS OF' query a lakehouse
    serves from SCD2 intervals like ``state_intervals_events``): probe
    points derive from the global time range by integer arithmetic
    (identical in both engines), and each probe's as-of lookup is a
    groupby-tail over the sorted user co-partition — three vectorized
    passes, no per-user loop. Users with no event at-or-before a probe
    are absent for that probe."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    agg = ds.aggregate(Min("ts"), Max("ts"))
    lo = pd.Timestamp(agg["min(ts)"]).value // 1000
    hi = pd.Timestamp(agg["max(ts)"]).value // 1000
    probes = [(i, lo + (hi - lo) * i // 4) for i in (1, 2, 3)]

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())), pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        tus = series_ts_us(g["ts"]).to_numpy()
        frames = []
        for i, pt in probes:
            sub = g[tus <= pt]
            last = sub.groupby("user_id", sort=False).tail(1)
            frames.append(pd.DataFrame({
                "probe": np.full(len(last), i, np.int64),
                "user_id": last["user_id"].to_numpy(np.int64),
                "state": last["event_type"].to_numpy()}))
        return pd.concat(frames, ignore_index=True)

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    out["probe"] = out["probe"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return (out.sort_values(["probe", "user_id"])
            .reset_index(drop=True))


def iso_week_orders(sf_dir: str) -> pd.DataFrame:
    """ISO-8601 week rollup (orders and revenue per ISO year-week —
    the calendar function whose week-years disagree with calendar
    years at every January/December boundary, so engine parity is a
    real check, not a formatting detail): Arrow's ``iso_year`` /
    ``iso_week`` kernels against DuckDB's ``isoyear``/``weekofyear``,
    integer-cent partials, weeks-sized reduce."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    _schema = pa.schema([("iso_year", pa.int64()), ("iso_week", pa.int64()),
                         ("n", pa.int64()), ("cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        od = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64())
        return (pa.table({"iso_year": pc.cast(pc.iso_year(od), pa.int64()),
                          "iso_week": pc.cast(pc.iso_week(od), pa.int64()),
                          "cents": cents})
                .group_by(["iso_year", "iso_week"])
                .aggregate([([], "count_all"), ("cents", "sum")])
                .rename_columns(["iso_year", "iso_week", "n", "cents"])
                .cast(_schema))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["iso_year", "iso_week"])
           .aggregate(Sum("n", alias_name="n"),
                      Sum("cents", alias_name="cents"))
           .to_pandas())
    out["revenue"] = out.pop("cents").to_numpy(np.float64) / 100.0
    for c in ("iso_year", "iso_week", "n"):
        out[c] = out[c].astype("int64")
    return (out.sort_values(["iso_year", "iso_week"])
            .reset_index(drop=True))


def hard_negatives_embeddings(sf_dir: str) -> pd.DataFrame:
    """Hard-negative mining for contrastive training (for every vector,
    the most cosine-similar vector carrying a DIFFERENT label — the
    pair-construction step of a triplet/InfoNCE data pipeline): exact
    all-pairs baseline in the ``cosine_pairs_embeddings`` mold — the
    id-sorted normalized matrix + label vector ``ray.put`` once and
    read zero-copy per task, the corpus side is a pure streaming map
    doing one ``X @ M.T`` matmul per batch with same-label columns
    masked to -inf; argmax over the id-sorted axis makes float ties
    land on the smaller neg_id, mirroring the oracle's
    ``(score DESC, neg_id)`` order. Anchors whose label covers the
    whole corpus have no negative and drop (matching the oracle's
    inner join). At 10^12 vectors the broadcast side routes through
    the IVF shortlist (stages/ann.py) exactly like ``knn_classify``;
    the masking rule is unchanged. Only ids are emitted, so the
    hash-compare is exact."""
    emb = (_t(sf_dir, "embeddings", ["vec_id", "label", "embedding"])
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    ids = emb["vec_id"].to_numpy(np.int64)
    labels = emb["label"].to_numpy(np.int64)
    X = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    ref = ray.put((ids, labels, X))

    def mine(t: pa.Table) -> pa.Table:
        all_ids, labs, mat = broadcast_get(ref)
        rid = t["vec_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(all_ids, rid)
        sims = mat[pos] @ mat.T
        same = labs[pos][:, None] == labs[None, :]
        sims = np.where(same, -np.inf, sims)
        has_neg = ~same.all(axis=1)
        neg = sims.argmax(axis=1)  # first max = smaller id (id-sorted)
        return pa.table({
            "vec_id": pa.array(rid[has_neg].astype(np.int64)),
            "neg_id": pa.array(all_ids[neg[has_neg]].astype(np.int64)),
        })

    out = (_t(sf_dir, "embeddings", ["vec_id"])
           .map_batches(mine, batch_format="pyarrow").to_pandas())
    return out.sort_values("vec_id").reset_index(drop=True)


def kaplan_meier_events(sf_dir: str) -> pd.DataFrame:
    """Kaplan-Meier survival table for view->purchase conversion:
    subjects are users with >=1 'view' (t0 = first view); the event is
    the first purchase STRICTLY after t0; subjects with none are
    right-censored at the study horizon (max ts over view/purchase
    events). Emits the exact-integer KM risk table — one row per
    whole-day duration where an event occurred, with the at-risk count
    n_risk = #subjects whose (event or censoring) time is >= t — so
    every number is an exact int and the survival curve is the running
    product over this frame. Shape: views pre-reduce to a per-batch
    per-user min, purchase rows ride the same user co-partition (a
    purchase below the still-unknown global t0 cannot be discarded
    early), each shard collapses to a (t, ev) histogram before leaving
    the task, and the reverse-cumulative risk set is computed on that
    durations-sized frame."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    day_us = 86400 * US
    _types = pa.array(["view", "purchase"])

    def tmax_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=_types))
        if len(t) == 0:
            return pa.table({"tmax": pa.array([], pa.int64())})
        tus = np.asarray(column_ts_us(t["ts"]))
        return pa.table({"tmax": pa.array([int(tus.max())], pa.int64())})

    _empty = pd.DataFrame({"t_days": pd.Series([], dtype="int64"),
                           "n_risk": pd.Series([], dtype="int64"),
                           "n_events": pd.Series([], dtype="int64")})
    hdf = ds.map_batches(tmax_partial, batch_format="pyarrow").to_pandas()
    if not len(hdf):
        return _empty
    tmax = int(hdf["tmax"].max())

    _schema = pa.schema([("user_id", pa.int64()), ("kind", pa.int64()),
                         ("tus", pa.int64()), ("_shard", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=_types))
        if len(t) == 0:
            return _schema.empty_table()
        tus = pa.array(np.asarray(column_ts_us(t["ts"])), pa.int64())
        tt = pa.table({"user_id": t["user_id"].cast(pa.int64()),
                       "event_type": t["event_type"], "tus": tus})
        v = (tt.filter(pc.equal(tt["event_type"], pa.scalar("view")))
             .group_by("user_id").aggregate([("tus", "min")])
             .rename_columns(["user_id", "tus"]))
        p = tt.filter(pc.equal(tt["event_type"], pa.scalar("purchase")))
        out = pa.concat_tables([
            pa.table({"user_id": v["user_id"],
                      "kind": pa.array(np.zeros(len(v), np.int64)),
                      "tus": v["tus"]}),
            pa.table({"user_id": p["user_id"],
                      "kind": pa.array(np.ones(len(p), np.int64)),
                      "tus": p["tus"]}),
        ])
        return add_shard_column(out, "user_id", 32).cast(_schema)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        v = g[g["kind"] == 0]
        if not len(v):
            return pd.DataFrame({"t": pd.Series([], dtype="int64"),
                                 "ev": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        t0 = v.groupby("user_id", sort=False)["tus"].min().rename("t0")
        p = (g[g["kind"] == 1].merge(t0, on="user_id", how="inner"))
        p = p[p["tus"] > p["t0"]]
        tp = p.groupby("user_id", sort=False)["tus"].min().rename("tp")
        f = t0.to_frame().join(tp, how="left")
        t0_us = f["t0"].to_numpy(np.int64)
        tp_us = f["tp"].to_numpy(np.float64)  # exact: us fits float53
        ev = ~np.isnan(tp_us)
        t = np.empty(len(f), np.int64)
        t[ev] = (tp_us[ev].astype(np.int64) - t0_us[ev]) // day_us
        t[~ev] = (tmax - t0_us[~ev]) // day_us
        return (pd.DataFrame({"t": t, "ev": ev.astype(np.int64)})
                .groupby(["t", "ev"], sort=False).size().rename("n")
                .reset_index())

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_shard").map_groups(per_shard, batch_format="pandas")
            .to_pandas())
    if not len(hist):
        return _empty
    hist = hist.groupby(["t", "ev"], as_index=False)["n"].sum()
    per_t = (hist.assign(nev=hist["n"] * hist["ev"])
             .groupby("t", as_index=False)
             .agg(n_events=("nev", "sum"), n_total=("n", "sum"))
             .sort_values("t", ascending=False))
    per_t["n_risk"] = per_t["n_total"].cumsum()
    out = per_t[per_t["n_events"] > 0].sort_values("t")
    return pd.DataFrame({
        "t_days": out["t"].to_numpy(np.int64),
        "n_risk": out["n_risk"].to_numpy(np.int64),
        "n_events": out["n_events"].to_numpy(np.int64),
    })


_FD_CANDIDATES = [("l_orderkey", "l_returnflag"),
                  ("l_orderkey", "l_shipdate"),
                  ("l_partkey", "l_extendedprice"),
                  ("l_returnflag", "l_linestatus")]


def fd_audit_lineitem(sf_dir: str) -> pd.DataFrame:
    """Functional-dependency audit (data profiling): for each candidate
    det -> dep pair, how many distinct determinant values exist and how
    many of them VIOLATE the dependency (more than one distinct
    dependent). Both sides stringify per batch (injective for these
    exact values, so distinctness classes are unchanged), all four
    candidates union into ONE tagged stream, and a single (fd, det)
    co-partition — dets never split across shards — lets each shard
    drop duplicate pairs and count violators locally; only a
    candidates-sized (fd, n_keys, n_violating) partial leaves each
    shard. The oracle mirrors with one COUNT(DISTINCT) subquery per
    candidate."""
    cols = sorted({c for pair in _FD_CANDIDATES for c in pair})
    ds = _t(sf_dir, "lineitem", cols)
    _schema = pa.schema([("fd", pa.string()), ("det", pa.string()),
                         ("dep", pa.string()), ("_shard", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        parts = []
        for det_c, dep_c in _FD_CANDIDATES:
            g = (pa.table({"det": pc.cast(t[det_c], pa.string()),
                           "dep": pc.cast(t[dep_c], pa.string())})
                 .group_by(["det", "dep"]).aggregate([]))
            parts.append(pa.table({
                "fd": pa.array([f"{det_c}->{dep_c}"] * len(g)),
                "det": g["det"], "dep": g["dep"]}))
        out = pa.concat_tables(parts)
        key = pc.binary_join_element_wise(out["fd"], out["det"], "|")
        shard = pa.array(shard_of(key.to_numpy(zero_copy_only=False), 32))
        return out.append_column("_shard", shard).cast(_schema)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["fd", "det", "dep"])
        per_det = (u.groupby(["fd", "det"], sort=False)["dep"].size()
                   .rename("d").reset_index())
        return (per_det.assign(viol=(per_det["d"] > 1).astype(np.int64))
                .groupby("fd", sort=False)
                .agg(n_keys=("det", "size"), n_violating=("viol", "sum"))
                .reset_index())

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas()
           .groupby("fd", as_index=False)[["n_keys", "n_violating"]].sum())
    for c in ("n_keys", "n_violating"):
        out[c] = out[c].astype("int64")
    return out.sort_values("fd").reset_index(drop=True)


def semdedup_label_embeddings(sf_dir: str, tau: float = 0.35) -> pd.DataFrame:
    """SemDeDup-style semantic dedup within classes: a vector is
    dropped when ANY lower-id vector of the same label sits at cosine
    >= tau — the single-pass, order-free variant of SemDeDup's greedy
    within-cluster prune (the greedy transitive form, where dropped
    vectors cannot cause further drops, lives in
    ``stages/neardup.py::embedding_dedup``'s cluster path; this rule is
    deliberately non-transitive so it is exactly SQL-expressible).
    Shape mirrors ``hard_negatives_embeddings``: id-sorted normalized
    matrix + labels broadcast once, corpus side a pure streaming map —
    one masked matmul per batch, keep when the lower-id same-label
    max cosine stays below tau. Only surviving ids are emitted."""
    emb = (_t(sf_dir, "embeddings", ["vec_id", "label", "embedding"])
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    ids = emb["vec_id"].to_numpy(np.int64)
    labels = emb["label"].to_numpy(np.int64)
    X = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    ref = ray.put((ids, labels, X))

    def prune(t: pa.Table) -> pa.Table:
        all_ids, labs, mat = broadcast_get(ref)
        rid = t["vec_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(all_ids, rid)
        sims = mat[pos] @ mat.T
        eligible = ((labs[pos][:, None] == labs[None, :])
                    & (all_ids[None, :] < rid[:, None]))
        dup = ((sims >= tau) & eligible).any(axis=1)
        return pa.table({
            "vec_id": pa.array(rid[~dup].astype(np.int64)),
            "label": pa.array(labs[pos][~dup].astype(np.int64)),
        })

    out = (_t(sf_dir, "embeddings", ["vec_id"])
           .map_batches(prune, batch_format="pyarrow").to_pandas())
    return out.sort_values("vec_id").reset_index(drop=True)


def bpe_pair_candidates(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """First-merge candidates for BPE tokenizer training: the k most
    frequent adjacent CHARACTER pairs across the corpus (pairs spanning
    a space excluded — merges never cross word boundaries), ties broken
    by pair ascending. The hot path is one numpy pass per batch: texts
    join on a single space (the boundary pairs that creates contain a
    space and are masked anyway), the byte view folds into 16-bit pair
    codes, and one bincount(65536) produces the batch partial; the
    global reduce rides a (pair-code, n) groupby bounded by 64Ki rows
    per block, and the top-k cut happens on that output-sized frame.
    Byte pairs == character pairs only for ASCII corpora (true for
    these tables by construction; a UTF-8 corpus would dictionary-
    encode codepoints first)."""
    ds = _t(sf_dir, "documents", ["text"])
    _schema = pa.schema([("code", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        blob = " ".join(t["text"].to_pylist()).encode()
        a = np.frombuffer(blob, np.uint8)
        if len(a) < 2:
            return _schema.empty_table()
        codes = a[:-1].astype(np.int32) * 256 + a[1:]
        keep = (a[:-1] != 32) & (a[1:] != 32)
        cnt = np.bincount(codes[keep], minlength=65536)
        nz = np.nonzero(cnt)[0]
        return pa.table({"code": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("code").aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    if not len(agg):
        return pd.DataFrame({"pair": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    # pair-code ascending IS pair-string ascending for ASCII
    agg = (agg.sort_values(["n", "code"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    agg["pair"] = [bytes([c >> 8, c & 255]).decode()
                   for c in agg["code"]]
    agg["n"] = agg["n"].astype("int64")
    return agg[["pair", "n"]]


def psi_value_drift(sf_dir: str, bins: int = 10) -> pd.DataFrame:
    """Population-stability-index drift check between the first and
    second half of the stream (the train/serve distribution-shift gate
    a production data pipeline runs before refreshing a model): the
    value range splits into 10 equal-width bins, events split at the
    midpoint timestamp, and each bin's Laplace-smoothed PSI
    contribution lands as a micro-unit int. Two streaming passes: a
    blocks-sized (tmin, tmax, vmin, vmax) partial-extrema pass, then a
    (half, bin) count partial per batch with a 2x10-row reduce. Counts
    are exact ints; the one float expression (p-q)*ln(p/q) is written
    identically here and in the oracle so both floor the same double
    (the dim_stats boundary rule)."""
    ds = _t(sf_dir, "events", ["ts", "value"])
    grid = np.arange(bins, dtype=np.int64)
    _zero = pd.DataFrame({"bin": grid,
                          "n_first": np.zeros(bins, np.int64),
                          "n_second": np.zeros(bins, np.int64),
                          "psi_micro": np.zeros(bins, np.int64)})

    def extrema(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"tmin": pa.array([], pa.int64()),
                             "tmax": pa.array([], pa.int64()),
                             "vmin": pa.array([], pa.float64()),
                             "vmax": pa.array([], pa.float64())})
        tus = np.asarray(column_ts_us(t["ts"]))
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({"tmin": pa.array([int(tus.min())], pa.int64()),
                         "tmax": pa.array([int(tus.max())], pa.int64()),
                         "vmin": pa.array([float(v.min())]),
                         "vmax": pa.array([float(v.max())])})

    ext = ds.map_batches(extrema, batch_format="pyarrow").to_pandas()
    if not len(ext):
        return _zero
    tmid = (int(ext["tmin"].min()) + int(ext["tmax"].max())) // 2
    vmin, vmax = float(ext["vmin"].min()), float(ext["vmax"].max())

    def counts(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "a": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        tus = np.asarray(column_ts_us(t["ts"]))
        v = t["value"].to_numpy(zero_copy_only=False)
        if vmax == vmin:
            b = np.zeros(len(v), np.int64)
        else:
            # the oracle computes this same ((v-vmin)*10)/(vmax-vmin)
            # double, so the floor boundary agrees bit-for-bit
            b = np.minimum(np.floor(((v - vmin) * float(bins))
                                    / (vmax - vmin)).astype(np.int64),
                           bins - 1)
        first = (tus < tmid).astype(np.int64)
        df = (pd.DataFrame({"bin": b, "a": first, "c": 1 - first})
              .groupby("bin", sort=False, as_index=False).sum())
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (ds.map_batches(counts, batch_format="pyarrow").to_pandas()
           .groupby("bin", as_index=False)[["a", "c"]].sum())
    full = (pd.DataFrame({"bin": grid}).merge(agg, on="bin", how="left")
            .fillna(0))
    a = full["a"].to_numpy(np.float64)
    c = full["c"].to_numpy(np.float64)
    n1, n2 = a.sum(), c.sum()
    p = (a + 1.0) / (n1 + float(bins))
    q = (c + 1.0) / (n2 + float(bins))
    psi = np.floor((p - q) * np.log(p / q) * 1_000_000.0 + 0.5)
    return pd.DataFrame({"bin": grid,
                         "n_first": a.astype(np.int64),
                         "n_second": c.astype(np.int64),
                         "psi_micro": psi.astype(np.int64)})


def skyline_parts(sf_dir: str) -> pd.DataFrame:
    """Skyline (Pareto frontier) of the part table — every part not
    dominated by another that is at-most-as-expensive AND
    at-least-as-big with one strict inequality (the classic
    two-criteria optimizer query). Distribution leans on the skyline
    algebra: a globally non-dominated row is non-dominated within its
    block, so each block emits its local skyline (sort by price asc /
    size desc + one segment-max sweep, no quadratic pass) and the
    exact final skyline is recomputed on the union — a frame the size
    of the frontier, not the table (worst case, a fully
    anti-correlated table, degrades the cut to the input; random data
    keeps it ~log-sized)."""
    ds = _t(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])

    def block_skyline(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values(["p_retailprice", "p_size", "p_partkey"],
                            ascending=[True, False, True])
        price = df["p_retailprice"].to_numpy(np.float64)
        size = df["p_size"].to_numpy(np.int64)
        # max size among STRICTLY cheaper rows
        run = np.maximum.accumulate(size)
        grp_start = np.r_[True, price[1:] != price[:-1]]
        start_idx = np.maximum.accumulate(
            np.where(grp_start, np.arange(len(df)), 0))
        prev_max = np.where(start_idx > 0, run[start_idx - 1],
                            np.iinfo(np.int64).min)
        # max size within the same price (first of each price group,
        # because the sort puts the biggest size first per price)
        eq_max = size[start_idx]
        dominated = (prev_max >= size) | (eq_max > size)
        return df[~dominated]

    sky = (ds.map_batches(block_skyline, batch_format="pandas")
           .to_pandas())
    out = block_skyline(sky)
    out["p_partkey"] = out["p_partkey"].astype("int64")
    out["p_size"] = out["p_size"].astype("int64")
    return out.sort_values("p_partkey").reset_index(drop=True)


def covered_time_per_user(sf_dir: str, window_s: int = 1800) -> pd.DataFrame:
    """Interval-union coverage: each event opens a 30-minute activity
    interval; the answer is the total UNION length per user (overlaps
    counted once — the interval-algebra sibling of the sweep-line
    ``max_concurrent_sessions``). One user co-partition, then per
    shard a sort + per-user running-max of interval ends turns the
    union into one vectorized clipped-gap sum; exact microsecond
    ints end-to-end and each shard emits final per-user rows (users
    never split across shards)."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])
    w_us = window_s * US

    def sharded(t: pa.Table) -> pa.Table:
        tus = pa.array(np.asarray(column_ts_us(t["ts"])), pa.int64())
        out = pa.table({"user_id": t["user_id"].cast(pa.int64()),
                        "tus": tus})
        return add_shard_column(out, "user_id", 32)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "tus"])
        s = g["tus"].to_numpy(np.int64)
        e = s + w_us
        gb = g.groupby("user_id", sort=False)
        pmax = gb["tus"].transform(
            lambda x: pd.Series(np.maximum.accumulate(
                x.to_numpy() + w_us), index=x.index).shift(1))
        pm = pmax.to_numpy(np.float64)  # NaN on each user's first row;
        # non-NaN values are <= tmax + w_us, inside float53, so exact
        prev = np.where(np.isnan(pm), s, pm).astype(np.int64)
        covered = np.clip(e - np.maximum(s, prev), 0, None)
        return (pd.DataFrame({"user_id": g["user_id"].to_numpy(np.int64),
                              "covered_us": covered})
                .groupby("user_id", as_index=False)["covered_us"].sum())

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    out["covered_us"] = out["covered_us"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def hrw_assignment_documents(sf_dir: str) -> pd.DataFrame:
    """Rendezvous (highest-random-weight) placement audit — the
    partitioning scheme a 256-node cluster would use to pin corpus
    shards to nodes, plus the minimal-movement proof when node 2
    leaves: every doc scores each of 5 nodes with the SQL-mirrorable
    Knuth hash, the owner is the argmax (ties to the smaller node),
    and the post-removal owner recomputes over the surviving nodes.
    By HRW's defining property only node 2's docs move, and the
    emitted per-node (n_before, n_after, n_moved_in) table shows it.
    Pure streaming map: each batch reduces to a <=25-row (owner,
    owner2) matrix; the driver sees nodes-sized frames only."""
    ds = _t(sf_dir, "documents", ["doc_id"])
    nodes = np.arange(5, dtype=np.uint64)

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if not len(ids):
            return pa.table({"owner": pa.array([], pa.int64()),
                             "owner2": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        m = np.uint64(4294967296)
        wt = (((ids[:, None] * np.uint64(1000003) + nodes[None, :]) % m)
              * np.uint64(2654435761)) % m
        owner = wt.argmax(axis=1)  # first max = smaller node id
        wt2 = wt.copy()
        wt2[:, 2] = 0  # node 2 leaves; weights are never 0-valued ties
        owner2 = wt2.argmax(axis=1)
        df = (pd.DataFrame({"owner": owner.astype(np.int64),
                            "owner2": owner2.astype(np.int64)})
              .groupby(["owner", "owner2"], as_index=False).size()
              .rename(columns={"size": "n"}))
        return pa.Table.from_pandas(df, preserve_index=False)

    mat = (ds.map_batches(assign, batch_format="pyarrow").to_pandas()
           .groupby(["owner", "owner2"], as_index=False)["n"].sum())
    grid = np.arange(5, dtype=np.int64)
    before = (mat.groupby("owner")["n"].sum()
              .reindex(grid, fill_value=0))
    after = (mat.groupby("owner2")["n"].sum()
             .reindex(grid, fill_value=0))
    moved_in = (mat[mat["owner"] != mat["owner2"]]
                .groupby("owner2")["n"].sum().reindex(grid, fill_value=0))
    return pd.DataFrame({"node": grid,
                         "n_before": before.to_numpy(np.int64),
                         "n_after": after.to_numpy(np.int64),
                         "n_moved_in": moved_in.to_numpy(np.int64)})


def cep_pattern_events(sf_dir: str) -> pd.DataFrame:
    """MATCH_RECOGNIZE-style CEP over per-user event sequences: count
    non-overlapping matches of the pattern signup -> (click|view)* ->
    purchase in each user's time-ordered stream (the regex-over-
    sequence generalization of ``funnel_events``, mirroring the
    reference's sequential trade-pattern scans in
    src/processors/dex_processor.rs). Each user's events co-locate in
    one of 32 fixed shards (a user lives in exactly one shard, so
    shard-local sequences are complete); inside the shard one sort +
    one groupby-join builds a compact type-initial string per user and
    a single vectorized ``str.count`` runs the automaton — the pattern
    alphabet excludes the terminal symbol, so greedy (Python re) and
    leftmost-longest (RE2) semantics coincide and the count is
    engine-independent. Only (user, n_matches) rows leave the shard."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())),
                        pa.int64())
        return t.append_column("_shard", shard)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        seq = (pd.Series(g["event_type"].str[0].to_numpy(),
                         index=g["user_id"].to_numpy())
               .groupby(level=0, sort=False).agg("".join))
        n = seq.str.count(r"s[cv]*p")
        n = n[n > 0]
        return pd.DataFrame({"user_id": n.index.to_numpy(np.int64),
                             "n_matches": n.to_numpy(np.int64)})

    out = (ds.map_batches(sharded, batch_format="pyarrow")
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    return out.sort_values("user_id").reset_index(drop=True)


def naive_bayes_lang_documents(sf_dir: str) -> pd.DataFrame:
    """Multinomial naive-Bayes language classifier, trained AND scored
    distributed (the classic count-based text classifier a curation
    pipeline uses when no pretrained model ships — the learned sibling
    of ``quality_model_documents``'s fixed weights). Training is pure
    aggregation: per-block (lang, token) count partials reduce once
    over the vocabulary domain (at 100 TB the vocabulary first prunes
    to a top-V Misra-Gries survivor set; here it is bounded), plus a
    langs-sized doc-count reduce for the priors. The model — a
    (vocab x langs) matrix of Laplace-smoothed log-likelihoods,
    quantized to exact 1e-9-unit int64 per cell (the ``geomean``
    contract: both engines round the SAME libm double once, then all
    arithmetic is order-free integer) — broadcasts via ``ray.put``;
    scoring is a pure map whose per-doc class sums never leave the
    block (a document lives in one block, so no shuffle). Argmax ties
    break to the lexicographically smallest language."""
    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    _tok_schema = pa.schema([("lang", pa.string()), ("w", pa.string()),
                             ("c", pa.int64())])
    _doc_schema = pa.schema([("lang", pa.string()), ("n", pa.int64())])

    def tok_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _tok_schema.empty_table()
        toks = pc.utf8_split_whitespace(t.column("text").combine_chunks())
        w = pc.list_flatten(toks)
        lang = pc.take(t.column("lang"), pc.list_parent_indices(toks))
        mask = pc.not_equal(w, "")
        return (pa.table({"lang": pc.filter(lang, mask),
                          "w": pc.filter(w, mask)})
                .group_by(["lang", "w"]).aggregate([([], "count_all")])
                .rename_columns(["lang", "w", "c"]).cast(_tok_schema))

    # the (lang, token) frame is model-sized (vocab x langs): blocks x
    # vocab pre-reduced partials merge on the driver — a Ray all-to-all
    # groupby over the vocab-domain group count cost ~4 s at sf0.1
    counts = (ds.map_batches(tok_partial, batch_format="pyarrow")
              .to_pandas()
              .groupby(["lang", "w"], as_index=False)["c"].sum())

    def doc_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _doc_schema.empty_table()
        return (t.select(["lang"]).group_by("lang")
                .aggregate([([], "count_all")])
                .rename_columns(["lang", "n"]).cast(_doc_schema))

    docs = (ds.map_batches(doc_partial, batch_format="pyarrow")
            .to_pandas().groupby("lang", as_index=False)["n"].sum()
            .sort_values("lang").reset_index(drop=True))

    langs = docs["lang"].tolist()
    n_total = int(docs["n"].sum())

    def _lnq(x: np.ndarray) -> np.ndarray:
        # the geomean contract: Arrow's ln on the exact IEEE ratio,
        # rounded once to 1e-9 units — bit-equal to the SQL oracle's
        # round(ln(x) * 1e9)
        return pc.cast(pc.round(pc.multiply(
            pc.ln(pa.array(x, pa.float64())), 1e9)), pa.int64()).to_numpy()

    piv = (counts.pivot_table(index="w", columns="lang", values="c",
                              aggfunc="sum", fill_value=0)
           .reindex(columns=langs, fill_value=0).sort_index())
    n_lang = piv.sum(axis=0).to_numpy(np.int64)   # tokens per lang
    vocab_n = len(piv)
    ll = np.stack([
        _lnq((piv[lg].to_numpy(np.int64) + 1.0) / float(n_lang[j] + vocab_n))
        for j, lg in enumerate(langs)], axis=1)   # vocab x langs int64
    prior_q = _lnq(docs["n"].to_numpy(np.int64) / float(n_total))
    tok_index = {w: i for i, w in enumerate(piv.index)}
    model_ref = ray.put((tok_index, ll, prior_q, langs))

    def score(t: pa.Table) -> pa.Table:
        tok_idx, mat, pq, lgs = broadcast_get(model_ref)
        toks = pc.utf8_split_whitespace(t.column("text").combine_chunks())
        w = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy()
        mask = pc.not_equal(w, "").to_numpy(zero_copy_only=False)
        rows = np.array([tok_idx[x] for x in
                         w.to_numpy(zero_copy_only=False)[mask]],
                        dtype=np.int64)
        scores = np.tile(pq, (len(t), 1))
        if len(rows):
            np.add.at(scores, parent[mask], mat[rows])
        best = scores.argmax(axis=1)  # first max = lexicographically
        return pa.table({                            # smallest lang
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "pred_lang": pa.array([lgs[b] for b in best], pa.string()),
            "score_q": pa.array(scores[np.arange(len(t)), best],
                                pa.int64())})

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def kcenter_select_embeddings(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """k-center greedy (farthest-point) coreset selection over the
    embedding table — the diversity sampler a training-data curation
    pipeline runs to pick maximally-spread exemplars (the geometric
    dual of ``semdedup_label_embeddings``'s redundancy removal).
    Elements quantize to exact 1e-6-unit int64 first (the
    ``embedding_norms`` rule), so every squared distance is an exact
    integer and the argmax — ties to the smallest vec_id — is
    bit-identical across block layouts and cluster sizes. Each of the
    k rounds is one streaming pass: centers-so-far broadcast (≤ k
    small vectors), each block emits only its local champion row, and
    the driver reduces a blocks-sized frame. At 100 TB the running
    min-distance column persists between rounds instead of being
    recomputed (k passes become k map-only incremental updates over a
    cached column); at test scale recomputation against ≤ k centers is
    the cheaper shape."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _champion(t: pa.Table, centers: np.ndarray | None) -> pa.Table:
        empty = pa.table({
            "vec_id": pa.array([], pa.int64()),
            "d2q": pa.array([], pa.int64()),
            "q": pa.array([], pa.list_(pa.int64()))})
        if len(t) == 0:
            return empty
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
        q = np.floor(m.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        if centers is None:  # seed round: farthest from the origin
            d2 = (q * q).sum(axis=1)
        else:
            d2 = np.full(len(q), np.iinfo(np.int64).max)
            for c in centers:  # <= k broadcast centers: k vectorized
                diff = q - c[None, :]          # passes, no pair matrix
                np.minimum(d2, (diff * diff).sum(axis=1), out=d2)
        ids = t["vec_id"].to_numpy()
        best = int(np.lexsort((ids, -d2))[0])  # max d2, tie -> min id
        return pa.table({
            "vec_id": pa.array([int(ids[best])], pa.int64()),
            "d2q": pa.array([int(d2[best])], pa.int64()),
            "q": pa.array([q[best].tolist()], pa.list_(pa.int64()))})

    selected: list[tuple[int, int, np.ndarray]] = []
    centers: np.ndarray | None = None
    for _ in range(k):
        cands = (ds.map_batches(
            lambda t, c=centers: _champion(t, c),
            batch_format="pyarrow").to_pandas())
        cands = cands.sort_values(
            ["d2q", "vec_id"], ascending=[False, True])
        row = cands.iloc[0]
        qvec = np.array(row["q"], dtype=np.int64)
        selected.append((int(row["vec_id"]), int(row["d2q"]), qvec))
        centers = np.stack([s[2] for s in selected])

    return pd.DataFrame({
        "step": np.arange(k, dtype=np.int64),
        "vec_id": np.array([s[0] for s in selected], np.int64),
        "d2q": np.array([s[1] for s in selected], np.int64)})


def approx_type_counts(sf_dir: str) -> pd.DataFrame:
    """Count-min frequency estimates for every event type (the
    point-query frequency sketch completing the HLL / histogram /
    Bloom / Misra-Gries family in ``stages/sketches.py``): per-block
    (depth x width) counter grids merge CELL-WISE through one
    constant-size groupby — exchange volume independent of row count —
    and the probe keys read the merged grid. Estimates never
    undercount (each row counts the key plus its collisions) and
    exceed truth by at most e*N/width w.h.p.; the exact-count twin for
    the accuracy pin is ``distinct_users``'s groupby family."""
    from ..stages.sketches import cms_counts
    ds = _t(sf_dir, "events", ["event_type"])
    probes = ["click", "error", "purchase", "signup", "view"]
    out = cms_counts(ds, "event_type", probes, depth=4, width=2048)
    return out.sort_values("item").reset_index(drop=True)


def ab_test_events(sf_dir: str) -> pd.DataFrame:
    """Two-proportion z-test on a deterministic A/B split (the
    experimentation readout a product pipeline runs): users assign to
    arms by the engine's SQL-mirrorable multiplicative hash (parity of
    ``multiplicative_hash_u32``), conversion = the user fired at least
    one purchase, and the test statistic ships as exact z² ppm — the
    pooled-variance z² rewrites as the integer rational
    n·(c1·n2 − c2·n1)² / (n1·n2·c·(n−c)), so no float boundary exists
    for the engines to disagree on (arbitrary-precision ints here,
    HUGEINT in the oracle). Per-user conversion finishes inside one
    32-shard user co-partition (a user lives in one shard), each shard
    emits 2 rows, and the driver folds the arms-sized frame."""
    ds = _t(sf_dir, "events", ["user_id", "event_type", "value"])

    def sharded(t: pa.Table) -> pa.Table:
        # conversion = a HIGH-VALUE purchase (cents > 39000), not any
        # purchase — on the fixtures every user purchases at least
        # once, which would make c = n and the pooled variance zero
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        conv = pc.cast(pc.and_(
            pc.equal(t["event_type"], "purchase"),
            pc.greater(cents, pa.scalar(39_000, pa.int64()))), pa.int64())
        shard = pc.cast(pc.bit_wise_and(t["user_id"],
                                        pa.scalar(31, pa.int64())),
                        pa.int64())
        return (pa.table({"user_id": t["user_id"], "conv": conv,
                          "_shard": shard})
                .group_by(["user_id", "_shard"])
                .aggregate([("conv", "max")])
                .rename_columns(["user_id", "_shard", "conv"]))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        u = (g.groupby("user_id", sort=False, as_index=False)["conv"]
             .max())
        from ..stages.hashing import multiplicative_hash_u32
        arm = (multiplicative_hash_u32(u["user_id"].to_numpy(np.int64))
               % np.uint64(2)).astype(np.int64)
        out = (pd.DataFrame({"arm": arm, "conv": u["conv"].to_numpy()})
               .groupby("arm", as_index=False)
               .agg(n_users=("conv", "size"), n_conv=("conv", "sum")))
        return out.astype({"arm": "int64", "n_users": "int64",
                           "n_conv": "int64"})

    arms = (ds.map_batches(sharded, batch_format="pyarrow")
            .groupby("_shard").map_groups(per_shard, batch_format="pandas")
            .to_pandas()
            .groupby("arm", as_index=False)[["n_users", "n_conv"]].sum()
            .sort_values("arm").reset_index(drop=True))
    n1, n2 = (int(arms["n_users"][0]), int(arms["n_users"][1]))
    c1, c2 = (int(arms["n_conv"][0]), int(arms["n_conv"][1]))
    n, c = n1 + n2, c1 + c2
    d = c1 * n2 - c2 * n1
    num = n * d * d * 1_000_000          # exact python ints
    den = n1 * n2 * c * (n - c)
    z2_ppm = (2 * num + den) // (2 * den) if den else 0
    out = pd.DataFrame({
        "arm": arms["arm"].astype("int64"),
        "n_users": arms["n_users"].astype("int64"),
        "n_conv": arms["n_conv"].astype("int64")})
    out["conv_ppm"] = _ppm(out["n_conv"].to_numpy(np.int64),
                           out["n_users"].to_numpy(np.int64))
    out["z2_ppm"] = np.int64(z2_ppm)
    return out


def ks_test_purchase_view(sf_dir: str) -> pd.DataFrame:
    """Two-sample Kolmogorov-Smirnov distance (the distribution-shift
    test a drift monitor runs where ``psi_value_drift`` wants bins and
    ``mannwhitney_purchase_view`` wants a rank statistic — KS is the
    max CDF gap, sensitive anywhere on the axis): both sides reduce to
    distinct-cents histograms exactly like the U-test, cumulative
    counts evaluate on the union grid with two searchsorted passes,
    and D = max |cum_p·n_v − cum_v·n_p| / (n_p·n_v) ships as exact
    half-away ppm — pure integer arithmetic, no row sort, the shuffle
    carries (type, cents) partials only."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    _schema = pa.schema([("event_type", pa.string()),
                         ("cents", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["event_type"],
                        value_set=pa.array(["purchase", "view"]))
        t = t.filter(mask)
        if len(t) == 0:
            return _schema.empty_table()
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        return (pa.table({"event_type": t["event_type"], "cents": cents})
                .group_by(["event_type", "cents"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "cents", "n"])
                .cast(_schema))

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n")).to_pandas())
    p = hist[hist["event_type"] == "purchase"].sort_values("cents")
    v = hist[hist["event_type"] == "view"].sort_values("cents")
    pv, pn = p["cents"].to_numpy(np.int64), p["n"].to_numpy(np.int64)
    vv, vn = v["cents"].to_numpy(np.int64), v["n"].to_numpy(np.int64)
    grid = np.union1d(pv, vv)
    pcum = np.concatenate([[0], np.cumsum(pn)])[
        np.searchsorted(pv, grid, side="right")]
    vcum = np.concatenate([[0], np.cumsum(vn)])[
        np.searchsorted(vv, grid, side="right")]
    n1, n2 = int(pn.sum()), int(vn.sum())
    num = int(np.abs(pcum.astype(object) * n2
                     - vcum.astype(object) * n1).max())
    d_ppm = int(_ppm(np.array([num], object),
                     np.array([n1 * n2], object))[0])
    return pd.DataFrame({"n1": np.array([n1], np.int64),
                         "n2": np.array([n2], np.int64),
                         "d_ppm": np.array([d_ppm], np.int64)})


def theilsen_daily_revenue(sf_dir: str) -> pd.DataFrame:
    """Theil-Sen robust trend (median of all pairwise slopes of the
    daily revenue series — the outlier-immune alternative to
    ``linreg_value_hour_by_type``'s OLS, the estimator SRE burn-rate
    and KPI-trend monitors prefer because one anomalous day cannot
    move it): the corpus reduces ONCE to the calendar-bounded
    (day, cents) frame, every pairwise slope ships as exact half-away
    ppm of cents/day (sign split first — Python ``//`` floors where
    the oracle's HUGEINT ``//`` truncates), and the median is the
    LOWER middle element (``sorted[(n-1)//2]``), exactly DuckDB's
    ``quantile_disc(0.5)`` — integer ties are bit-stable. The pair
    cross is days²-sized, bounded by the calendar, never by rows."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    _schema = pa.schema([("day", pa.int64()), ("cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        days = np.asarray(column_ts_us(t["o_orderdate"])) // (86400 * US)
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        return (pa.table({"day": pa.array(days), "cents": pa.array(cents)})
                .group_by("day").aggregate([("cents", "sum")])
                .rename_columns(["day", "cents"]).cast(_schema))

    days = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("cents", alias_name="cents"))
            .to_pandas().sort_values("day"))
    d = days["day"].to_numpy(np.int64)
    c = days["cents"].to_numpy(np.int64).astype(object)
    iu, ju = np.triu_indices(len(d), k=1)
    num = c[ju] - c[iu]
    den = (d[ju] - d[iu]).astype(object)
    slopes = np.sort(_ppm(num, den))
    n_pairs = len(slopes)
    med = int(slopes[(n_pairs - 1) // 2]) if n_pairs else 0
    return pd.DataFrame({"n_pairs": np.array([n_pairs], np.int64),
                         "slope_ppm": np.array([med], np.int64)})


def seasonality_dow_revenue(sf_dir: str) -> pd.DataFrame:
    """Day-of-week seasonal index (each weekday's average daily
    revenue relative to the overall daily average — the multiplicative
    seasonality profile a forecaster divides out before trend fitting;
    ``autocorr7_daily_revenue`` detects weekly seasonality, this one
    MEASURES it): the corpus reduces to the calendar-bounded daily
    frame once, per-dow (n_days, cents) fold on the 7-row frame, and
    index = (dow_sum · total_days) / (dow_days · total_sum) ships as
    exact half-away ppm — missing calendar days simply don't enter
    either engine's denominators. Epoch-anchored dow (1970-01-01 + 4 =
    Thursday), the ``dow_orders`` locale-free convention."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    _schema = pa.schema([("day", pa.int64()), ("cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        days = np.asarray(column_ts_us(t["o_orderdate"])) // (86400 * US)
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        return (pa.table({"day": pa.array(days), "cents": pa.array(cents)})
                .group_by("day").aggregate([("cents", "sum")])
                .rename_columns(["day", "cents"]).cast(_schema))

    days = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("cents", alias_name="cents"))
            .to_pandas())
    dow = ((days["day"].to_numpy(np.int64) + 4) % 7)
    g = (pd.DataFrame({"dow": dow,
                       "cents": days["cents"].to_numpy(np.int64)})
         .groupby("dow", as_index=False)
         .agg(n_days=("cents", "size"), cents=("cents", "sum")))
    total_days = int(g["n_days"].sum())
    total_cents = int(g["cents"].astype(object).sum())
    idx = _ppm(g["cents"].to_numpy().astype(object) * total_days,
               g["n_days"].to_numpy().astype(object) * total_cents)
    out = g.astype({"dow": "int64", "n_days": "int64", "cents": "int64"})
    out["index_ppm"] = idx
    return out.sort_values("dow").reset_index(drop=True)


def target_encode_segment(sf_dir: str) -> pd.DataFrame:
    """Leave-one-out target encoding (each order's market segment
    encoded as the mean totalprice of the OTHER orders in that segment
    — the leakage-free categorical featurizer a tabular-ML pipeline
    applies before training; naive target encoding leaks the row's own
    label): the custkey->segment map broadcasts (dimension side), the
    5-segment (sum, n) stats fold from per-batch partials on the
    driver, broadcast back, and the encode is a pure vectorized map —
    (seg_sum − own) / (seg_n − 1) as exact half-away ppm of cents;
    singleton segments encode 0. Two streaming passes, no shuffle."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    # dense-key lookup ARRAY, not a dict: segment codes index by
    # custkey with one vectorized fancy-index per batch (a dict .map
    # pays a Python hash per row; the array is the same broadcast)
    seg_names, seg_inv = np.unique(cust["c_mktsegment"], return_inverse=True)
    keys = cust["c_custkey"].to_numpy(np.int64)
    code_of = np.full(int(keys.max()) + 1, -1, np.int64)
    code_of[keys] = seg_inv
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        code = code_of[t["o_custkey"].to_numpy(zero_copy_only=False)]
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        return pa.table({
            "code": pa.array(np.arange(len(seg_names), dtype=np.int64)),
            "n": pa.array(np.bincount(code, minlength=len(seg_names))
                          .astype(np.int64)),
            "s": pa.array(np.bincount(code, weights=cents,
                                      minlength=len(seg_names))
                          .astype(np.int64))})

    stats = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
             .groupby("code").agg(n=("n", "sum"), s=("s", "sum"))
             .sort_index())
    n_arr = stats["n"].to_numpy(np.int64)
    s_arr = stats["s"].to_numpy(np.int64)

    def encode(t: pa.Table) -> pa.Table:
        code = code_of[t["o_custkey"].to_numpy(zero_copy_only=False)]
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        n, s = n_arr[code], s_arr[code].astype(object)
        loo = np.zeros(len(t), np.int64)
        m = n > 1
        loo[m] = _ppm(s[m] - cents[m].astype(object),
                      (n[m] - 1).astype(object))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "segment": pa.array(seg_names[code], pa.string()),
            "loo_ppm": pa.array(loo, pa.int64())})

    out = ds.map_batches(encode, batch_format="pyarrow").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def rrf_fuse_documents(sf_dir: str, k: int = 60,
                       depth: int = 100) -> pd.DataFrame:
    """Reciprocal-rank fusion of two retrieval rankings (the standard
    hybrid-search combiner — BM25 list + vector list -> one list —
    applied here to two deterministic corpus rankings: by length
    (n_chars) and by vocabulary richness (distinct whitespace
    tokens)): each block emits its LOCAL top-``depth`` on each metric
    (2·depth rows per block, rank-safe because global top-depth ⊆
    concat of block top-depths), the driver takes the global
    top-``depth`` lists, and the fused score 1/(k+r_a) + 1/(k+r_b)
    over the candidate union ships as exact half-away ppm of the
    integer rational — docs outside a list contribute nothing (the
    standard RRF convention, rank 0 here). Top-20 by score then
    doc_id; ties in both metrics break by doc_id ascending."""
    ds = _t(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nch = t["n_chars"].to_numpy(zero_copy_only=False)
        vocab = np.fromiter(
            (len(set(x.split())) for x in t["text"].to_pylist()),
            np.int64, len(t))
        df = pd.DataFrame({"doc_id": ids, "n_chars": nch, "vocab": vocab})
        top_a = df.sort_values(["n_chars", "doc_id"],
                               ascending=[False, True]).head(depth)
        top_b = df.sort_values(["vocab", "doc_id"],
                               ascending=[False, True]).head(depth)
        return pa.Table.from_pandas(
            pd.concat([top_a, top_b]).drop_duplicates("doc_id"),
            preserve_index=False)

    cand = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
            .drop_duplicates("doc_id"))
    top_a = cand.sort_values(["n_chars", "doc_id"],
                             ascending=[False, True]).head(depth)
    top_b = cand.sort_values(["vocab", "doc_id"],
                             ascending=[False, True]).head(depth)
    ra = {int(d): i + 1 for i, d in enumerate(top_a["doc_id"])}
    rb = {int(d): i + 1 for i, d in enumerate(top_b["doc_id"])}
    rows = []
    for d in sorted(set(ra) | set(rb)):
        a, b = ra.get(d, 0), rb.get(d, 0)
        if a and b:
            num, den = (k + a) + (k + b), (k + a) * (k + b)
        else:
            num, den = 1, k + (a or b)
        ppm = (2 * num * 1_000_000 + den) // (2 * den)
        rows.append((d, a, b, ppm))
    out = pd.DataFrame(rows, columns=["doc_id", "rank_len",
                                      "rank_vocab", "score_ppm"])
    out = (out.sort_values(["score_ppm", "doc_id"],
                           ascending=[False, True]).head(20)
           .reset_index(drop=True))
    return out.astype({"doc_id": "int64", "rank_len": "int64",
                       "rank_vocab": "int64", "score_ppm": "int64"})


def zorder_cells_lineitem(sf_dir: str) -> pd.DataFrame:
    """Z-order (Morton) layout audit — interleave the low 8 bits of
    (partkey, suppkey) into a 16-bit space-filling-curve key and
    profile the 64 top-level curve cells (z >> 10), the data-layout
    diagnostic a lakehouse OPTIMIZE/Z-ORDER decision reads to see how
    co-clustering the two keys would distribute row mass: the
    interleave is 16 vectorized shift-mask-or ops per batch, the
    shuffle carries 64-row per-block partials, and per-cell revenue
    sums as integer cents."""
    ds = _t(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice"])

    _schema = pa.schema([("cell", pa.int64()), ("n", pa.int64()),
                         ("cents", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        x = t["l_partkey"].to_numpy(zero_copy_only=False) & 0xFF
        y = t["l_suppkey"].to_numpy(zero_copy_only=False) & 0xFF
        z = np.zeros(len(t), np.int64)
        for b in range(8):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        cents = np.round(t["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return (pa.table({"cell": pa.array(z >> 10),
                          "cents": pa.array(cents)})
                .group_by("cell")
                .aggregate([([], "count_all"), ("cents", "sum")])
                .rename_columns(["cell", "n", "cents"]).cast(_schema))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("cell")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("cents", alias_name="cents"))
           .to_pandas().sort_values("cell").reset_index(drop=True))
    return out.astype({"cell": "int64", "n": "int64", "cents": "int64"})


def mmr_select_embeddings(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """Maximal-marginal-relevance selection (pick k vectors that are
    RELEVANT to a query yet mutually diverse — the result-diversifier
    hybrid retrieval runs after ANN, and the balanced cousin of
    ``kcenter_select_embeddings``'s pure-diversity rule). The query is
    the corpus centroid (per-dim mean, one (n, Σ) reduce, rounded to
    the same 1e-6 grid as the vectors), relevance and redundancy are
    exact integer dot products on the quantized vectors, and each of
    the k rounds maximizes rel(d) − max_{s∈S} sim(d, s) — λ = 1/2
    scaled out — with ties to the smallest vec_id, so selection is
    bit-identical across block layouts (numpy-replay pytest pins it).
    Per round each block emits ONE local champion against the ≤ k
    broadcast picks; the driver reduces a blocks-sized frame."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def moments(t: pa.Table) -> pa.Table:
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
        q = np.floor(m.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        return pa.table({"n": pa.array([len(q)], pa.int64()),
                         "s": pa.array([q.sum(axis=0).tolist()],
                                       pa.list_(pa.int64()))})

    mom = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = int(mom["n"].sum())
    s = np.sum(np.stack(mom["s"].to_numpy()), axis=0).astype(object)
    # centroid on the same 1e-6 grid: floor(s/n + 1/2) as exact ints
    qry = np.array([(2 * int(v) + n) // (2 * n) for v in s], np.int64)

    _schema = pa.schema([("vec_id", pa.int64()), ("score", pa.int64()),
                         ("q", pa.list_(pa.int64()))])

    def champion(t: pa.Table, picks: np.ndarray | None,
                 picked_ids: np.ndarray) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
        q = np.floor(m.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        rel = q @ qry
        if picks is None:
            score = rel
        else:
            score = rel - (q @ picks.T).max(axis=1)
            mask = ~np.isin(ids, picked_ids)  # picked rows never re-select
            if not mask.any():
                return _schema.empty_table()
            q, ids, score = q[mask], ids[mask], score[mask]
        best = int(np.lexsort((ids, -score))[0])
        return pa.table({"vec_id": pa.array([int(ids[best])], pa.int64()),
                         "score": pa.array([int(score[best])], pa.int64()),
                         "q": pa.array([q[best].tolist()],
                                       pa.list_(pa.int64()))})

    picks_list: list[tuple[int, int, np.ndarray]] = []
    picks: np.ndarray | None = None
    _picked_ids = np.array([], np.int64)
    for _ in range(k):
        cands = (ds.map_batches(
            lambda t, p=picks, pi=_picked_ids: champion(t, p, pi),
            batch_format="pyarrow").to_pandas())
        cands = cands.sort_values(["score", "vec_id"],
                                  ascending=[False, True])
        row = cands.iloc[0]
        picks_list.append((int(row["vec_id"]), int(row["score"]),
                           np.array(row["q"], np.int64)))
        picks = np.stack([p[2] for p in picks_list])
        _picked_ids = np.array([p[0] for p in picks_list], np.int64)

    return pd.DataFrame({
        "step": np.arange(k, dtype=np.int64),
        "vec_id": np.array([p[0] for p in picks_list], np.int64),
        "score": np.array([p[1] for p in picks_list], np.int64)})


def zonemap_prune_audit(sf_dir: str) -> pd.DataFrame:
    """Zone-map (min/max statistics) pruning audit — for a file layout
    written in orderkey order (file id = o_orderkey // 4096) and four
    date predicates of widening selectivity, how many files would a
    reader's min/max skip actually prune, and how much of what it must
    scan is wasted? The lakehouse data-skipping diagnostic that pairs
    with ``zorder_cells_lineitem``: clustering quality is exactly what
    zone maps convert into skipped IO. Pass 1 reduces the global date
    span (2 ints); pass 2 folds per-file (min_day, max_day, n, and
    per-predicate match counts) — files-sized partials — and the
    per-predicate roll-up happens on the driver: scanned = files whose
    zone overlaps the range, waste = scanned rows that do not match,
    as exact half-away ppm of scanned rows."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    _mm = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])

    def minmax(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _mm.empty_table()
        days = np.asarray(column_ts_us(t["o_orderdate"])) // (86400 * US)
        return pa.table({"lo": pa.array([int(days.min())], pa.int64()),
                         "hi": pa.array([int(days.max())], pa.int64())})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    # predicates: the first 1/16, 1/8, 1/4, 1/2 of the date span
    span = hi - lo
    preds = [(lo, lo + span // d) for d in (16, 8, 4, 2)]

    def per_file(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"fid": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             **{f"m{i}": pa.array([], pa.int64())
                                for i in range(4)}})
        fid = t["o_orderkey"].to_numpy(zero_copy_only=False) // 4096
        days = np.asarray(column_ts_us(t["o_orderdate"])) // (86400 * US)
        df = pd.DataFrame({"fid": fid, "d": days})
        for i, (a, b) in enumerate(preds):
            df[f"m{i}"] = ((df["d"] >= a) & (df["d"] <= b)).astype(np.int64)
        g = (df.groupby("fid", as_index=False)
             .agg(mn=("d", "min"), mx=("d", "max"), n=("d", "size"),
                  **{f"m{i}": (f"m{i}", "sum") for i in range(4)}))
        return pa.Table.from_pandas(g, preserve_index=False)

    files = (ds.map_batches(per_file, batch_format="pyarrow").to_pandas()
             .groupby("fid")
             .agg(mn=("mn", "min"), mx=("mx", "max"), n=("n", "sum"),
                  **{f"m{i}": (f"m{i}", "sum") for i in range(4)}))
    rows = []
    for i, (a, b) in enumerate(preds):
        scan = files[(files["mx"] >= a) & (files["mn"] <= b)]
        n_scan_rows = int(scan["n"].sum())
        n_match = int(scan[f"m{i}"].sum())
        rows.append((i, len(files), len(scan), n_scan_rows, n_match,
                     int(_ppm(np.array([n_scan_rows - n_match], object),
                              np.array([n_scan_rows], object))[0])
                     if n_scan_rows else 0))
    return pd.DataFrame(rows, columns=[
        "pred", "n_files", "n_scan_files", "scan_rows", "match_rows",
        "waste_ppm"]).astype("int64")


def quantile_normalize_chars(sf_dir: str) -> pd.DataFrame:
    """Rank-based quantile normalization of document length across
    sources (map each source's n_chars distribution onto the pooled
    distribution — the batch-effect corrector that makes per-source
    features comparable before mixing corpora): within each source a
    doc takes rank r (by n_chars then doc_id — total order, tie-proof),
    its pooled position is idx = ((N−1)·(2r−1)) // (2·n_src) — the
    midpoint rule in exact integer arithmetic — and the normalized
    value is the pooled (idx+1)-th smallest n_chars, read from the
    broadcast pooled cumulative histogram with one searchsorted (the
    histogram is value-domain-sized, never rows-sized). Ranks live
    inside a per-source co-partition; sources are a small domain."""
    ds = _t(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def hist(t: pa.Table) -> pa.Table:
        return (t.select(["n_chars"]).group_by("n_chars")
                .aggregate([([], "count_all")])
                .rename_columns(["n_chars", "n"]))

    pooled = (ds.map_batches(hist, batch_format="pyarrow")
              .groupby("n_chars").aggregate(Sum("n", alias_name="n"))
              .to_pandas().sort_values("n_chars"))
    vals = pooled["n_chars"].to_numpy(np.int64)
    cum = pooled["n"].to_numpy(np.int64).cumsum()
    N = int(cum[-1])

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        r = np.arange(1, len(g) + 1, dtype=np.int64)
        n_src = len(g)
        idx = ((N - 1) * (2 * r - 1)) // (2 * n_src)
        norm = vals[np.searchsorted(cum, idx + 1, side="left")]
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "source": g["source"],
                             "n_chars": g["n_chars"].to_numpy(np.int64),
                             "norm_chars": norm})

    out = (ds.groupby("source")
           .map_groups(per_source, batch_format="pandas").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def wasserstein_purchase_view(sf_dir: str) -> pd.DataFrame:
    """Wasserstein-1 (earth mover's) distance between the purchase and
    view value distributions — the integral counterpart that completes
    the drift family (``psi_value_drift`` bins, ``ks_test_purchase_view``
    takes the max CDF gap, W1 integrates it): over the union histogram
    grid, W1 = Σ |F_p − F_v| · gap, computed exactly as
    Σ |cum_p·n_v − cum_v·n_p| · (v_{i+1} − v_i) / (n_p·n_v) in
    arbitrary-precision ints and shipped as half-away ppm of cents.
    Same (type, cents) histogram partials as the KS test; the engines
    share one integer formula with no float boundary."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    _schema = pa.schema([("event_type", pa.string()),
                         ("cents", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["event_type"],
                        value_set=pa.array(["purchase", "view"]))
        t = t.filter(mask)
        if len(t) == 0:
            return _schema.empty_table()
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        return (pa.table({"event_type": t["event_type"], "cents": cents})
                .group_by(["event_type", "cents"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "cents", "n"])
                .cast(_schema))

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n")).to_pandas())
    p = hist[hist["event_type"] == "purchase"].sort_values("cents")
    v = hist[hist["event_type"] == "view"].sort_values("cents")
    pv, pn = p["cents"].to_numpy(np.int64), p["n"].to_numpy(np.int64)
    vv, vn = v["cents"].to_numpy(np.int64), v["n"].to_numpy(np.int64)
    grid = np.union1d(pv, vv)
    pcum = np.concatenate([[0], np.cumsum(pn)])[
        np.searchsorted(pv, grid, side="right")].astype(object)
    vcum = np.concatenate([[0], np.cumsum(vn)])[
        np.searchsorted(vv, grid, side="right")].astype(object)
    n1, n2 = int(pn.sum()), int(vn.sum())
    gaps = np.diff(grid).astype(object)
    num = int((np.abs(pcum[:-1] * n2 - vcum[:-1] * n1) * gaps).sum()) \
        if len(grid) > 1 else 0
    w1_ppm = int(_ppm(np.array([num], object),
                      np.array([n1 * n2], object))[0])
    return pd.DataFrame({"n1": np.array([n1], np.int64),
                         "n2": np.array([n2], np.int64),
                         "w1_ppm": np.array([w1_ppm], np.int64)})


def did_revenue_segments(sf_dir: str) -> pd.DataFrame:
    """Difference-in-differences readout (did BUILDING's mean order
    value move more than MACHINERY's across the midpoint of the date
    span? — the quasi-experimental causal estimator observational
    product analytics runs where ``ab_test_events`` has a randomized
    split): the custkey->treated code broadcasts as a dense lookup
    array, the split day derives from the GLOBAL date span by integer
    arithmetic (identical in both engines), each batch folds into 4
    (treated, post) bincount cells, and the driver finishes. Each
    cell mean ships as exact half-away ppm of cents; the DiD is the
    integer difference of the four ROUNDED means — both engines
    difference after the shared rounding rule, so no float boundary
    exists. Cells sum exactly; missing cells yield did_ppm = 0."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    keys = cust["c_custkey"].to_numpy(np.int64)
    grp = np.full(int(keys.max()) + 1, -1, np.int64)
    seg = cust["c_mktsegment"].to_numpy()
    grp[keys[seg == "MACHINERY"]] = 0
    grp[keys[seg == "BUILDING"]] = 1
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    _mm = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])

    def minmax(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _mm.empty_table()
        days = np.asarray(column_ts_us(t["o_orderdate"])) // (86400 * US)
        return pa.table({"lo": pa.array([int(days.min())], pa.int64()),
                         "hi": pa.array([int(days.max())], pa.int64())})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    split = lo + (hi - lo) // 2

    def cells(t: pa.Table) -> pa.Table:
        g = grp[t["o_custkey"].to_numpy(zero_copy_only=False)]
        m = g >= 0
        days = (np.asarray(column_ts_us(t["o_orderdate"]))
                // (86400 * US))[m]
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)[m]
        cell = 2 * g[m] + (days > split)
        return pa.table({
            "cell": pa.array(np.arange(4, dtype=np.int64)),
            "n": pa.array(np.bincount(cell, minlength=4)
                          .astype(np.int64)),
            "s": pa.array(np.bincount(cell, weights=cents, minlength=4)
                          .astype(np.int64))})

    agg = (ds.map_batches(cells, batch_format="pyarrow").to_pandas()
           .groupby("cell").agg(n=("n", "sum"), s=("s", "sum"))
           .sort_index())
    agg = agg[agg["n"] > 0]
    mean_ppm = _ppm(agg["s"].to_numpy().astype(object),
                    agg["n"].to_numpy().astype(object))
    means = dict(zip(agg.index, mean_ppm))
    did = ((means[3] - means[2]) - (means[1] - means[0])
           if all(c in means for c in range(4)) else 0)
    out = pd.DataFrame({
        "treated": (agg.index.to_numpy() // 2).astype(np.int64),
        "post": (agg.index.to_numpy() % 2).astype(np.int64),
        "n": agg["n"].to_numpy(np.int64),
        "cents": agg["s"].to_numpy(np.int64),
        "mean_ppm": mean_ppm,
        "did_ppm": np.int64(did)})
    return out.reset_index(drop=True)


def l_diversity_audit_events(sf_dir: str, l: int = 3) -> pd.DataFrame:
    """L-diversity audit (how many distinct SENSITIVE values — event
    types — appear within each quasi-identifier class (user bucket x
    hour-of-day x day-of-week)? — the follow-on privacy check after
    ``k_anonymity_audit_events``: a k-anonymous class is still
    re-identifying when everyone in it shares one sensitive value):
    distinct (qi, sensitive) combinations reduce to the
    domain-bounded frame (32·24·7·|types| max) with per-batch
    distinct partials, the per-class distinct count and the minimum
    diversity read that tiny frame. The user bucket is the engine's
    SQL-mirrorable multiplicative hash mod 32."""
    from ..stages.hashing import multiplicative_hash_u32
    ds = _t(sf_dir, "events", ["user_id", "event_type", "ts"])

    _schema = pa.schema([("b", pa.int64()), ("h", pa.int64()),
                         ("dow", pa.int64()), ("event_type", pa.string())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _schema.empty_table()
        tus = np.asarray(column_ts_us(t["ts"]))
        h = (tus // HOUR_US) % 24
        dow = (tus // DAY_US + 4) % 7
        b = (multiplicative_hash_u32(
            t["user_id"].to_numpy(zero_copy_only=False))
            % np.uint64(32)).astype(np.int64)
        return (pa.table({"b": pa.array(b), "h": pa.array(h),
                          "dow": pa.array(dow),
                          "event_type": t["event_type"]})
                .group_by(["b", "h", "dow", "event_type"])
                .aggregate([]).cast(_schema))

    combos = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["b", "h", "dow", "event_type"]).count()
              .to_pandas())
    div = (combos.groupby(["b", "h", "dow"]).size()
           .to_numpy(np.int64))
    return pd.DataFrame({
        "n_classes": np.array([len(div)], np.int64),
        "min_l": np.array([int(div.min())], np.int64),
        "n_below_l": np.array([int((div < l).sum())], np.int64)})


def cuped_adjusted_events(sf_dir: str) -> pd.DataFrame:
    """CUPED variance-reduced experiment readout (adjust each user's
    post-period purchase spend by their pre-period spend before
    comparing arms — the industry-standard covariate adjustment that
    completes the experimentation stack: ``ab_test_events`` tests raw
    proportions, ``did_revenue_segments`` differences observational
    groups, CUPED shrinks randomized-arm variance): the time split is
    the global midpoint (integer arithmetic on the us span), per-user
    (pre, post) cent sums finish inside one 32-shard user co-partition,
    each shard emits constant-size moment partials (n, Σx, Σy, Σxx,
    Σxy as arbitrary-precision ints) plus per-arm (n, Σx, Σy), and the
    driver computes θ = cov/var as half-away ppm and the adjusted arm
    means via one shared integer formula — mean_adj = (n·Σy_a·10⁶ −
    θ_ppm·(n·Σx_a − n_a·Σx)) / (n·n_a), every term exact, so both
    engines agree to the bit. Arms via the SQL-mirrorable
    multiplicative hash; zero pre-period variance yields θ = 0."""
    from ..stages.hashing import multiplicative_hash_u32
    ds = _t(sf_dir, "events", ["user_id", "event_type", "ts", "value"])

    _mm = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])

    def minmax(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _mm.empty_table()
        tus = np.asarray(column_ts_us(t["ts"]))
        return pa.table({"lo": pa.array([int(tus.min())], pa.int64()),
                         "hi": pa.array([int(tus.max())], pa.int64())})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    split = (int(mm["lo"].min()) + int(mm["hi"].max())) // 2

    def sharded(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["event_type"], "purchase")
        t = t.filter(mask)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        tus = np.asarray(column_ts_us(t["ts"]))
        pre = np.where(tus <= split, cents, 0)
        post = np.where(tus > split, cents, 0)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        shard = uid & 31
        return (pa.table({"user_id": pa.array(uid), "_shard":
                          pa.array(shard), "x": pa.array(pre),
                          "y": pa.array(post)})
                .group_by(["user_id", "_shard"])
                .aggregate([("x", "sum"), ("y", "sum")])
                .rename_columns(["user_id", "_shard", "x", "y"]))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        u = (g.groupby("user_id", sort=False, as_index=False)
             [["x", "y"]].sum())
        x = u["x"].to_numpy(np.int64).astype(object)
        y = u["y"].to_numpy(np.int64).astype(object)
        arm = (multiplicative_hash_u32(u["user_id"].to_numpy(np.int64))
               % np.uint64(2)).astype(np.int64)
        rows = {"n": len(u), "sx": int(x.sum()), "sy": int(y.sum()),
                "sxx": int((x * x).sum()), "sxy": int((x * y).sum())}
        for a in (0, 1):
            m = arm == a
            rows[f"n{a}"] = int(m.sum())
            rows[f"sx{a}"] = int(x[m].sum())
            rows[f"sy{a}"] = int(y[m].sum())
        return pd.DataFrame([rows]).astype(object)

    p = (ds.map_batches(sharded, batch_format="pyarrow")
         .groupby("_shard").map_groups(per_shard, batch_format="pandas")
         .to_pandas())
    n = int(p["n"].sum())
    sx, sy = int(p["sx"].sum()), int(p["sy"].sum())
    sxx, sxy = int(p["sxx"].sum()), int(p["sxy"].sum())
    cov, var = n * sxy - sx * sy, n * sxx - sx * sx

    def _div_half(num: int, den: int) -> int:
        """Exact half-away-from-zero integer division (den > 0); the
        numerator already carries the ppm scale."""
        if den == 0:
            return 0
        sign = -1 if num < 0 else 1
        return sign * ((2 * abs(num) + den) // (2 * den))

    theta_ppm = _div_half(cov * 1_000_000, var)
    rows = []
    for a in (0, 1):
        na = int(p[f"n{a}"].sum())
        sxa, sya = int(p[f"sx{a}"].sum()), int(p[f"sy{a}"].sum())
        mean_post = _div_half(sya * 1_000_000, na) if na else 0
        adj = (n * sya * 1_000_000 - theta_ppm * (n * sxa - na * sx))
        mean_adj = _div_half(adj, n * na) if na else 0
        rows.append((a, na, mean_post, mean_adj))
    out = pd.DataFrame(rows, columns=["arm", "n_users",
                                      "mean_post_ppm", "mean_adj_ppm"])
    out["theta_ppm"] = np.int64(theta_ppm)
    return out.astype({"arm": "int64", "n_users": "int64",
                       "mean_post_ppm": "int64",
                       "mean_adj_ppm": "int64", "theta_ppm": "int64"})


def bpe_train_documents(sf_dir: str, n_merges: int = 10) -> pd.DataFrame:
    """Distributed BPE tokenizer training (learn the first ``n_merges``
    merge rules — ``bpe_pair_candidates`` mines only the FIRST merge;
    this runs the actual iterative algorithm, the tokenizer-training
    pattern an LLM data pipeline executes before token counting): the
    corpus reduces ONCE to the word-frequency table (the standard BPE
    trick — training touches word types x counts, never the corpus
    again), words symbolize to character lists, and each round is one
    map+reduce over the words-domain Dataset: per-block (pair, count)
    partials -> a pair-domain groupby -> per-block top-1 -> the
    driver picks max count (ties: lexicographic smallest pair) and
    broadcasts the merge; a map rewrites symbol lists left-to-right
    non-overlapping. Rounds materialize (object-store-backed) so round
    r never re-executes rounds 0..r-1. Per-word Python loops run on
    the REDUCED word-type frame, not corpus rows — the same
    inherent-scalar-work budget as the text family."""
    docs = _t(sf_dir, "documents", ["text"])

    def word_tf(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: "Counter[str]" = Counter()
        for text in t["text"].to_pylist():
            c.update((text or "").split())
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    words = (docs.map_batches(word_tf, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("n", alias_name="n")))

    def symbolize(t: pa.Table) -> pa.Table:
        return pa.table({
            "syms": pa.array([list(w) for w in t["word"].to_pylist()],
                             pa.list_(pa.string())),
            "n": t["n"]})

    cur = (words.map_batches(symbolize, batch_format="pyarrow")
           .materialize())

    _pair_schema = pa.schema([("pair", pa.string()), ("n", pa.int64())])

    def pair_counts(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: "Counter[str]" = Counter()
        for syms, n in zip(t["syms"].to_pylist(),
                           t["n"].to_pylist()):
            for a, b in zip(syms, syms[1:]):
                c[f"{a}\x1f{b}"] += n
        if not c:
            return _pair_schema.empty_table()
        return pa.table({"pair": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    def local_top1(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _pair_schema.empty_table()
        df = t.to_pandas().sort_values(["n", "pair"],
                                       ascending=[False, True])
        return pa.Table.from_pandas(df.head(1), preserve_index=False)

    merges = []
    for step in range(n_merges):
        top = (cur.map_batches(pair_counts, batch_format="pyarrow")
               .groupby("pair").aggregate(Sum("n", alias_name="n"))
               .map_batches(local_top1, batch_format="pyarrow")
               .to_pandas())
        if len(top) == 0:
            break
        top = top.sort_values(["n", "pair"], ascending=[False, True])
        pair, cnt = top.iloc[0]["pair"], int(top.iloc[0]["n"])
        left, right = pair.split("\x1f", 1)
        merges.append((step, left, right, cnt))

        def apply_merge(t: pa.Table, a=left, b=right) -> pa.Table:
            out = []
            for syms in t["syms"].to_pylist():
                res, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == a
                            and syms[i + 1] == b):
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            return pa.table({"syms": pa.array(out,
                                              pa.list_(pa.string())),
                             "n": t["n"]})

        cur = cur.map_batches(apply_merge,
                              batch_format="pyarrow").materialize()

    return pd.DataFrame(merges, columns=["step", "left", "right", "n"]
                        ).astype({"step": "int64", "n": "int64"})


def ipw_revenue_nations(sf_dir: str) -> pd.DataFrame:
    """Stratified inverse-propensity-weighted outcome estimate (mean
    order value under 'treatment' — BUILDING-segment membership —
    reweighted by each nation stratum's propensity, the observational
    estimator that closes the causal family: randomized ``ab_test``,
    parallel-trends ``did_revenue_segments``, covariate ``cuped``,
    confounder-adjusting IPW): the custkey->(nation, treated) lookup
    broadcasts as dense arrays, each batch folds (nation, arm) cells
    with two bincounts, and the strata-sized frame finishes on the
    driver. Both engines round the inverse-propensity weights to
    half-away ppm FIRST and form every downstream quantity from those
    shared integers (weighted means as half-away integer division), so
    no float boundary exists. Strata missing either arm are excluded
    from both sums and from N, per the standard positivity rule."""
    cust = _t(sf_dir, "customer",
              ["c_custkey", "c_mktsegment", "c_nationkey"]).to_pandas()
    keys = cust["c_custkey"].to_numpy(np.int64)
    nat_of = np.full(int(keys.max()) + 1, -1, np.int64)
    nat_of[keys] = cust["c_nationkey"].to_numpy(np.int64)
    trt_of = np.zeros(int(keys.max()) + 1, np.int64)
    trt_of[keys] = (cust["c_mktsegment"].to_numpy()
                    == "BUILDING").astype(np.int64)
    n_nat = int(cust["c_nationkey"].max()) + 1
    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cells(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        nat, trt = nat_of[ck], trt_of[ck]
        cents = np.round(t["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        cell = 2 * nat + trt
        return pa.table({
            "cell": pa.array(np.arange(2 * n_nat, dtype=np.int64)),
            "n": pa.array(np.bincount(cell, minlength=2 * n_nat)
                          .astype(np.int64)),
            "s": pa.array(np.bincount(cell, weights=cents,
                                      minlength=2 * n_nat)
                          .astype(np.int64))})

    agg = (ds.map_batches(cells, batch_format="pyarrow").to_pandas()
           .groupby("cell").agg(n=("n", "sum"), s=("s", "sum")))
    nc = agg["n"].reindex(2 * np.arange(n_nat), fill_value=0).to_numpy()
    nt = agg["n"].reindex(2 * np.arange(n_nat) + 1,
                          fill_value=0).to_numpy()
    yc = agg["s"].reindex(2 * np.arange(n_nat), fill_value=0).to_numpy()
    yt = agg["s"].reindex(2 * np.arange(n_nat) + 1,
                          fill_value=0).to_numpy()

    def _half(num: int, den: int) -> int:
        sign = -1 if num < 0 else 1
        return sign * ((2 * abs(num) + den) // (2 * den))

    valid = (nt > 0) & (nc > 0)
    rows = []
    for k in np.nonzero(valid)[0]:
        ns = int(nt[k] + nc[k])
        rows.append((int(k), ns, int(nt[k]), int(yt[k]), int(yc[k]),
                     _half(1_000_000 * ns, int(nt[k])),
                     _half(1_000_000 * ns, int(nc[k]))))
    df = pd.DataFrame(rows, columns=["nationkey", "n", "nt", "yt_cents",
                                     "yc_cents", "w_t_ppm", "w_c_ppm"])
    n_eff = int(df["n"].sum())
    mu_t = _half(int((df["yt_cents"].astype(object)
                      * df["w_t_ppm"].astype(object)).sum()), n_eff)
    mu_c = _half(int((df["yc_cents"].astype(object)
                      * df["w_c_ppm"].astype(object)).sum()), n_eff)
    df["ate_ppm"] = np.int64(mu_t - mu_c)
    return (df.sort_values("nationkey").reset_index(drop=True)
            .astype("int64"))


def kcore_copurchase(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """K-core decomposition of the co-purchase graph (iteratively peel
    nodes of degree < k until the graph stabilizes — the
    density-subgraph classic that completes the graph family next to
    pagerank / BFS / triangles / components; recommender and fraud
    pipelines read the surviving core as the 'structurally engaged'
    part set): edges come from the shared co-purchase kernel and stay
    a distributed Dataset; each peel round is one pure-map pass with
    the alive-set broadcast (per-block degree partials group inside
    the block) and a node-bounded driver merge — the same
    frontier-on-driver / edges-distributed contract as
    ``bfs_copurchase_levels``. Deterministic: simultaneous removal
    each round (the standard parallel peeling schedule)."""
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def sharded(t: pa.Table) -> pa.Table:
        shard = pc.cast(pc.bit_wise_and(t["l_orderkey"],
                                        pa.scalar(63, pa.int64())),
                        pa.int64())
        return (pa.table({"l_orderkey": t["l_orderkey"],
                          "l_partkey": t["l_partkey"], "_shard": shard})
                .group_by(["l_orderkey", "l_partkey", "_shard"])
                .aggregate([]))

    pairs, _ = _pairs_in_shards(
        ds.map_batches(sharded, batch_format="pyarrow"),
        ["l_orderkey"], "l_partkey")
    pairs = pairs[pairs["n"] >= 2]
    edges = rd.from_arrow(pa.table({
        "src": pa.array(np.concatenate(
            [pairs["l_partkey_a"].to_numpy(np.int64),
             pairs["l_partkey_b"].to_numpy(np.int64)])),
        "dst": pa.array(np.concatenate(
            [pairs["l_partkey_b"].to_numpy(np.int64),
             pairs["l_partkey_a"].to_numpy(np.int64)])),
    })).materialize()

    alive = set(pairs["l_partkey_a"].tolist()) | set(
        pairs["l_partkey_b"].tolist())
    degrees: dict[int, int] = {}
    while True:
        a_ref = ray.put(np.fromiter(alive, dtype=np.int64))

        def deg_partial(t: pa.Table) -> pa.Table:
            a = broadcast_get(a_ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            m = np.isin(src, a) & np.isin(dst, a)
            return (pa.table({"src": pa.array(src[m])})
                    .group_by("src").aggregate([([], "count_all")])
                    .rename_columns(["src", "d"]))

        deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
               .to_pandas().groupby("src")["d"].sum())
        degrees = {int(n): int(d) for n, d in deg.items()}
        survivors = {n for n, d in degrees.items() if d >= k}
        if survivors == alive:
            break
        alive = survivors
        if not alive:
            break
    out = pd.DataFrame(
        sorted((n, degrees.get(n, 0)) for n in alive),
        columns=["node", "degree"])
    return out.astype({"node": "int64", "degree": "int64"}) if len(out) \
        else pd.DataFrame({"node": pd.Series([], dtype="int64"),
                           "degree": pd.Series([], dtype="int64")})


def hll_audience_overlap(sf_dir: str, p: int = 14) -> pd.DataFrame:
    """HyperLogLog set-operation estimates (how many users both
    purchased AND viewed — |A|, |B|, |A∪B| from mergeable sketches,
    overlap by inclusion-exclusion): the sketch answer to
    ``audience_jaccard_types``' exact set intersection — at 100 TB the
    exact operator shuffles every distinct user id once, this one
    moves a 16 KiB register array per (type, block) and the union is
    an elementwise max of the two merged sketches. Approximate by
    construction (rows-only; accuracy vs exact pinned <3% in
    test_sketches.py)."""
    from ..stages.sketches import _hash_column, _hll_estimate, _hll_registers
    ds = _t(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["event_type"],
                        value_set=pa.array(["purchase", "view"]))
        t = t.filter(mask)
        out_g, out_s = [], []
        if len(t):
            hashes = _hash_column(t["user_id"])
            groups = t["event_type"].to_numpy(zero_copy_only=False)
            for g in np.unique(groups):
                out_g.append(str(g))
                out_s.append(_hll_registers(hashes[groups == g],
                                            p).tobytes())
        return pa.table({"event_type": pa.array(out_g, pa.string()),
                         "_sketch": pa.array(out_s, pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    regs = {g: np.zeros(1 << p, np.uint8) for g in ("purchase", "view")}
    for g, blob in zip(parts["event_type"], parts["_sketch"]):
        np.maximum(regs[g], np.frombuffer(blob, np.uint8), out=regs[g])
    est_a = int(round(_hll_estimate(regs["purchase"])))
    est_b = int(round(_hll_estimate(regs["view"])))
    est_u = int(round(_hll_estimate(
        np.maximum(regs["purchase"], regs["view"]))))
    return pd.DataFrame({
        "est_purchase": np.array([est_a], np.int64),
        "est_view": np.array([est_b], np.int64),
        "est_union": np.array([est_u], np.int64),
        "est_overlap": np.array([est_a + est_b - est_u], np.int64)})


def phash_dedup_images(sf_dir: str) -> pd.DataFrame:
    """Cross-format image near-duplicate detection (64-bit integer
    average-hash -> plain groupby -> duplicate groups): the corpus
    interleaves REAL BMP wire bytes and fake-container payloads
    carrying the SAME pixels (every part-key triple shares one
    deterministic image), so duplicate groups must span formats — the
    wire-level dedup a multimodal curation pipeline runs before
    training. The hash is computed in an actor-pool map stage
    (``PerceptualHashStage``, exact integer thresholding), the groupby
    is hash-domain-sized, and only groups with >= 2 members ship.
    Rows-only (binary payloads; pytest pins the expected group
    structure and the truncated-payload quarantine path)."""
    from ..stages.multimodal import PerceptualHashStage, encode_bmp

    keys = _t(sf_dir, "part", ["p_partkey"]).to_pandas()["p_partkey"].tolist()

    def payload(k: int) -> bytes:
        g = k // 3
        w, h = 8 + g % 8, 8 + g % 5
        if k % 3 == 0:  # real BMP wire format
            rng = np.random.default_rng(g)
            return encode_bmp(rng.integers(0, 256, size=(h, w),
                                           dtype=np.uint8))
        # fake container, SAME pixels as the BMP sibling
        rng = np.random.default_rng(g)
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        import struct as _s
        from ..stages.multimodal import _IMG_MAGIC
        return _IMG_MAGIC + _s.pack("<II", w, h) + px.tobytes()

    rows = [{"img_id": int(k), "image": payload(int(k))} for k in keys]
    ds = rd.from_items(rows)
    hashed = ds.map_batches(
        PerceptualHashStage,
        fn_constructor_kwargs={"image_col": "image"},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 2),
    ).to_pandas()
    hashed = hashed.dropna(subset=["phash"])
    g = (hashed.groupby("phash")
         .agg(n=("img_id", "size"), min_img_id=("img_id", "min"))
         .reset_index())
    g = g[g["n"] >= 2].sort_values("min_img_id").reset_index(drop=True)
    return g.astype({"phash": "int64", "n": "int64",
                     "min_img_id": "int64"})


def containment_pairs_documents(sf_dir: str) -> pd.DataFrame:
    """Excerpt detection via exact char-trigram CONTAINMENT >= 0.95
    within lang blocks — the dedup axis Jaccard misses (a quoted or
    pasted passage inside a longer page has low resemblance but high
    containment of its shingle set; Broder 1997's "containment" vs
    "resemblance" distinction). Integer inter/min_sz ship beside the
    double so the SQL oracle is bit-exact."""
    from ..stages.neardup import ngram_containment_pairs

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])
    out = ngram_containment_pairs(ds, threshold=0.95, block_col="lang")
    for c in ("id_a", "id_b", "inter", "min_sz"):
        out[c] = out[c].astype("int64")
    out["containment"] = out["containment"].astype("float64")
    return out.reset_index(drop=True)


def boilerplate_ngrams_documents(sf_dir: str, min_docs: int = 4) -> pd.DataFrame:
    """CCNet/RefinedWeb-style boilerplate audit: a word trigram is
    boilerplate when it appears in >= ``min_docs`` DISTINCT documents
    (headers, footers, nav chrome repeat across a crawl; novel prose
    does not). Per surviving document: distinct-trigram count, how many
    are corpus-boilerplate, and the boilerplate share in exact ppm.

    Distributed shape: pass 1 computes per-block (gram -> n_docs)
    partials (a doc's text lives in one row, so per-doc distinctness is
    block-local) and one gram-domain groupby sums them; only grams with
    df >= min_docs return to the driver — bounded by total_grams /
    min_docs by construction, the same broadcast-small-side contract as
    the decontamination gate. Pass 2 is a pure map over documents
    against the broadcast frozenset. At 100 TB the broadcast set for a
    low cutoff could be swapped for a gram-shard shuffle join (the
    inverted-index shape) without changing the output."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def gram_partials(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: "Counter[str]" = Counter()
        for text in t["text"].to_pylist():
            w = (text or "").strip().split()
            c.update({" ".join(w[i:i + 3]) for i in range(len(w) - 2)})
        return pa.table({"g": pa.array(list(c.keys()), pa.string()),
                         "nd": pa.array(list(c.values()), pa.int64())})

    df = (docs.map_batches(gram_partials, batch_format="pyarrow")
          .groupby("g").aggregate(Sum("nd", alias_name="ndocs")))
    boiler = frozenset(
        r["g"] for r in df.filter(
            lambda r: r["ndocs"] >= min_docs).take_all())
    boiler_ref = ray.put(boiler)

    def per_doc(t: pa.Table) -> pa.Table:
        bset = ray.get(boiler_ref)
        ids, n_grams, n_boiler = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            w = (text or "").strip().split()
            grams = {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
            if not grams:
                continue  # mirror the oracle: gram-less docs drop out
            ids.append(doc_id)
            n_grams.append(len(grams))
            n_boiler.append(sum(1 for g in grams if g in bset))
        ng = np.array(n_grams, np.int64)
        nb = np.array(n_boiler, np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_grams": pa.array(ng),
            "n_boiler": pa.array(nb),
            "boiler_ppm": pa.array(_ppm(nb, ng) if len(ng) else
                                   np.array([], np.int64)),
        })

    out = docs.map_batches(per_doc, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def temperature_mix_documents(sf_dir: str) -> pd.DataFrame:
    """Temperature-resampled language mix (the multilingual-LM recipe:
    sample langs ∝ p^α with α = 1/2 so low-resource languages are
    up-weighted relative to their corpus share). Exact in integers:
    each lang keeps documents at rate min_l isqrt(n_l) / isqrt(n_lang)
    via the house Knuth-hash threshold rule — keep doc iff
    ((doc_id * 2654435761) mod 2^32 mod 10^6) * isqrt(n_lang)
    < 10^6 * min_isqrt — deterministic across engines and layouts.
    floor(sqrt(double)) == isqrt for all n below ~2^50 (IEEE sqrt is
    correctly rounded; the nearest double to sqrt(k^2 - 1) sits below
    k until 1/(2k) shrinks under ulp(k)), so DuckDB mirrors it.

    Lang counts (a 5-key domain) merge on the driver — house rule for
    group domains priced below a shuffle; the keep pass is a pure map
    with per-block count partials."""
    import math

    docs = _t(sf_dir, "documents", ["doc_id", "lang"])

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n"])

    parts = docs.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    n_by_lang = parts.groupby("lang")["n"].sum().to_dict()
    isq = {lang: math.isqrt(int(n)) for lang, n in n_by_lang.items()}
    min_isq = min(isq.values())

    def kept_partial(t: pa.Table) -> pa.Table:
        h = pc.multiply(t["doc_id"], pa.scalar(_SAMPLE_MULT, pa.int64()))
        m = pa.scalar(_SAMPLE_MOD, pa.int64())
        h = pc.subtract(h, pc.multiply(pc.divide(h, m), m))
        mm = pa.scalar(1_000_000, pa.int64())
        h = pc.subtract(h, pc.multiply(pc.divide(h, mm), mm))
        lang_isq = pa.array([isq[v] for v in t["lang"].to_pylist()],
                            pa.int64())
        keep = pc.less(pc.multiply(h, lang_isq),
                       pa.scalar(1_000_000 * min_isq, pa.int64()))
        kept = t.filter(keep)
        g = kept.group_by("lang").aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n_kept"])

    kp = docs.map_batches(kept_partial, batch_format="pyarrow").to_pandas()
    kept_by_lang = kp.groupby("lang")["n_kept"].sum().to_dict()

    langs = sorted(n_by_lang)
    nd = np.array([n_by_lang[x] for x in langs], np.int64)
    nk = np.array([kept_by_lang.get(x, 0) for x in langs], np.int64)
    iq = np.array([isq[x] for x in langs], np.int64)
    return pd.DataFrame({
        "lang": langs,
        "n_docs": nd,
        "n_kept": nk,
        "rate_ppm": _ppm(np.full(len(langs), min_isq, np.int64) * 1, iq)
        if len(langs) else np.array([], np.int64),
        "actual_ppm": _ppm(nk, nd) if len(langs) else np.array([], np.int64),
    })


class _BpeEncoder:
    """Actor-pool tokenizer: applies a broadcast ranked merge list to
    each document (lowest-rank pair first, left-to-right
    non-overlapping within a rank — the standard BPE encode order,
    matching how ``bpe_train_documents`` rewrote the corpus), with a
    per-actor word -> token-count cache (web text's Zipfian word reuse
    makes the cache hit rate the whole game; setup once per actor in
    __init__, per the actor-pool contract)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.rank = {pair: i for i, pair in enumerate(merges)}
        self.cache: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        hit = self.cache.get(word)
        if hit is not None:
            return hit
        syms = list(word)
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = self.rank.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = (syms[i], syms[i + 1]), r
            if best is None:
                break
            a, b = best
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        n = len(syms)
        if len(self.cache) < 1_000_000:  # bounded per-actor cache
            self.cache[word] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, n_words, n_chars, n_tokens = [], [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            words = (text or "").split()
            ids.append(doc_id)
            n_words.append(len(words))
            n_chars.append(sum(len(w) for w in words))
            n_tokens.append(sum(self._encode_len(w) for w in words))
        nc = np.array(n_chars, np.int64)
        nt = np.array(n_tokens, np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(n_words, type=pa.int64()),
            "n_chars": pa.array(nc),
            "n_tokens": pa.array(nt),
            "compress_ppm": pa.array(
                _ppm(nt, np.where(nc == 0, 1, nc)) * (nc > 0)
                if len(nc) else np.array([], np.int64)),
        })


def bpe_encode_documents(sf_dir: str, n_merges: int = 10) -> pd.DataFrame:
    """Tokenize the corpus with the BPE merges ``bpe_train_documents``
    learns on the same data — the train-then-apply pair every LLM data
    pipeline runs before token-budget accounting. Training reduces the
    corpus to the word-type table once (distributed, see
    bpe_train_documents); encoding is an actor-pool map over documents
    with the ranked merge list broadcast into each actor and a
    per-actor word cache. Rows-only (the encode loop is iterative
    per-word rewriting, not ANSI SQL); pinned by a pure-Python replay
    pytest."""
    merges_df = bpe_train_documents(sf_dir, n_merges=n_merges)
    merges = list(zip(merges_df["left"], merges_df["right"]))

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(
        _BpeEncoder,
        fn_constructor_kwargs={"merges": merges},
        batch_format="pyarrow", concurrency=(1, 4),
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
