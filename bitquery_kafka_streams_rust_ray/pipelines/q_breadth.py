"""Breadth entries: sampling, set ops, date/math scalar functions, rollup/pivot, per-key running windows and mergeable sketches (the 100 TB distinct/quantile path).

Split from the former monolithic ``pipelines/queries.py`` (round 4); the ``queries`` shim
re-exports every entry, so importers are unaffected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Sum
from ..stages.dedup import exact_dedup
from ..stages.join import broadcast_join, hash_join, join_buckets
from ..stages.timeops import US, series_ts_us
from .q_relational import _round2, _t, _tbytes



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
