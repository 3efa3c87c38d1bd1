"""Behavioral / sessions / graph analytics: journeys, attribution, co-occurrence, funnels, intervals, audits.

Split from the former monolithic ``pipelines/queries.py`` (round 4); the ``queries`` shim
re-exports every entry, so importers are unaffected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum
from ..stages.broadcast import broadcast_get
from ..stages.hashing import add_shard_column
from ..stages.join import broadcast_join, hash_join, join_buckets, semi_join
from ..stages.neardup import component_labels
from ..stages.timeops import (US,
    column_ts_us,
    series_ts_us,
    us_to_timestamp_array)
from .q_relational import DAY_US, HOUR_US, _pairs_in_shards, _ppm, _t, _tbytes
from .q_stats import _fulfillment_lag_hist, _levenshtein_batch



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
