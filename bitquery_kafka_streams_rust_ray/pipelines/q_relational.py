"""Relational core: grouped aggregation, filters, dedup, event-time windows, CEP, joins, sort/top-k, scalar string functions, percentiles and text heuristics (SURVEY §2.2-2.8).

Split from the former monolithic ``pipelines/queries.py`` (round 4); the ``queries`` shim
re-exports every entry, so importers are unaffected.
"""

from __future__ import annotations

import json
import os
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum
from ..functions.text import TextAnalyzer
from ..stages.dedup import exact_dedup, windowed_dedup
from ..stages.join import (broadcast_asof_join,
    broadcast_join,
    hash_join,
    join_buckets,
    semi_join)
from ..stages.timeops import US, column_ts_us, us_to_timestamp_array
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


def segment_orders(sf_dir: str,
                   broadcast_threshold_bytes: int = 1 << 28
                   ) -> pd.DataFrame:
    """Join orders -> customer, grouped by market segment.

    Size-adaptive join (the house rule, cf. bigram_lm_documents):
    broadcast the customer dimension when its on-disk footprint is
    small — the common case — and fall back to a partitioned hash
    join when it out-grows a single process (at web scale the
    customer dim grows with the fact table, so a to_pandas broadcast
    would not survive). test_queries_oracle pins both paths to the
    same oracle hash."""
    cust_bytes = _tbytes(sf_dir, "customer")
    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    if cust_bytes <= broadcast_threshold_bytes:
        cust = _t(sf_dir, "customer",
                  ["c_custkey", "c_mktsegment"]).to_pandas()
        cust = cust.rename(columns={"c_custkey": "o_custkey"})
        joined = broadcast_join(ds, cust, on="o_custkey", how="inner",
                                concurrency=8)
    else:
        cust_ds = _t(sf_dir, "customer",
                     ["c_custkey", "c_mktsegment"]).map_batches(
            lambda t: t.rename_columns(["o_custkey", "c_mktsegment"]),
            batch_format="pyarrow")
        joined = hash_join(ds, cust_ds, on="o_custkey",
                           buckets=join_buckets(
                               _tbytes(sf_dir, "orders", "customer")))

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


def priority_sample_orders(sf_dir: str, k: int = 200) -> pd.DataFrame:
    """Priority sampling (Duffield-Lund-Thorup, JACM 2007): a
    weight-biased without-replacement sample of the k orders with the
    largest priorities q_i = w_i / u_i, where u_i derives from the
    shared multiplicative hash of the order key. All arithmetic is
    EXACT INTEGER (cross-multiplied: floor(w_cents * 2^32 / (h+1)),
    which fits int64), so the distributed partial-top-k and the SQL
    oracle agree bit-for-bit — the exponential-keys A-ES form would
    hang the oracle on cross-libm pow/ln ties. Scale shape: per-block
    vectorized partial top-k + driver merge of k-row partials (the
    topk_orders pattern); the weighted-sampling primitive every
    corpus-subsample / importance-sampling pipeline needs."""
    from ..stages.hashing import multiplicative_hash_u32

    def partial(t: pa.Table) -> pa.Table:
        ids = t["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        h = multiplicative_hash_u32(ids)
        pr = ((cents.astype(np.uint64) << np.uint64(32))
              // (h + np.uint64(1))).astype(np.int64)
        kk = min(k, len(ids))
        # top-kk by (priority desc, id asc), exact tie-break
        idx = np.lexsort((ids, -pr))[:kk]
        return pa.table({
            "o_orderkey": pa.array(ids[idx]),
            "w_cents": pa.array(cents[idx]),
            "priority": pa.array(pr[idx]),
        })

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):  # empty input -> schema-less empty frame
        parts = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                              "w_cents": pd.Series(dtype="int64"),
                              "priority": pd.Series(dtype="int64")})
    out = (parts.sort_values(["priority", "o_orderkey"],
                             ascending=[False, True], kind="mergesort")
           .head(k))
    return (out.sort_values("o_orderkey").reset_index(drop=True)
            [["o_orderkey", "w_cents", "priority"]])


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


def sliding_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Exact COUNT(DISTINCT user) per sliding event-time window (2 h
    size / 1 h slide) — the exact batch twin of the streaming engine's
    HLL-sketched per-window distinct (stages/sketches.py). Each event
    replicates to its ceil(size/slide) = 2 covering windows INSIDE the
    block map and block-dedupes immediately, so the shuffle carries
    per-block DISTINCT (window, user) pairs, never event-grain rows;
    the two-level reduce (groupby pair -> groupby window count)
    finishes it. Exact per-window distinct does not decompose over
    overlapping windows without sketches — this replicate-then-dedup
    shape is the exact path, HLL the constant-space one."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def emit(t: pa.Table) -> pa.Table:
        ts_us = column_ts_us(t["ts"])
        users = t["user_id"].to_numpy(zero_copy_only=False)
        s0 = (ts_us // HOUR_US) * HOUR_US
        ws = np.concatenate([s0, s0 - HOUR_US])
        us = np.concatenate([users, users])
        return (pa.table({"ws_us": pa.array(ws),
                          "user_id": pa.array(us)})
                .group_by(["ws_us", "user_id"]).aggregate([]))

    pairs = (ds.map_batches(emit, batch_format="pyarrow")
             .groupby(["ws_us", "user_id"])
             .aggregate(Count(alias_name="_c")))
    out = (pairs.groupby("ws_us")
           .aggregate(Count(alias_name="n_users")).to_pandas())
    if not len(out):  # empty input -> schema-less empty frame
        out = pd.DataFrame({"ws_us": pd.Series(dtype="int64"),
                            "n_users": pd.Series(dtype="int64")})
    out["window_start"] = us_to_timestamp_array(
        out["ws_us"].to_numpy(np.int64))
    out["window_end"] = us_to_timestamp_array(
        out["ws_us"].to_numpy(np.int64) + 2 * HOUR_US)
    out["n_users"] = out["n_users"].astype("int64")
    return (out[["window_start", "window_end", "n_users"]]
            .sort_values("window_start").reset_index(drop=True))


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
