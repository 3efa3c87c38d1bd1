"""Streaming engine showcases (rows-only pages-log runs) plus the SQL-oracled final-state views over the events table.

Split from the former monolithic ``pipelines/queries.py`` (round 4); the ``queries`` shim
re-exports every entry, so importers are unaffected.
"""

from __future__ import annotations

import os
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum
from ..stages.broadcast import broadcast_get
from ..stages.timeops import column_ts_us
from .q_relational import DAY_US, HOUR_US, _pairs_in_shards, _ppm, _t



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
    each iteration (`ray.put`), and emit ONE Newton partial row per
    block — the int64 nano-quantized per-row sums of the gradient
    X^T(p-y) (4 values) AND the Hessian X^T diag(p(1-p)) X upper
    triangle (10 values). The fold is exact integer arithmetic, so
    training is bit-identical across block layouts and cluster sizes
    (same recipe as the integer-scaled kmeans partials). 8 fixed
    Newton/IRLS steps (quadratic convergence: machine-precision optimum
    by ~6 — the round-3 version needed 25 first-order GD rounds, and at
    this scale each round is a driver-priced dataset pass). At 100 TB
    the same loop runs on minibatch hash-samples per step; the partial
    shape (14 ints per block per step) is already the scale-correct
    exchange."""
    iters, nano = 8, 1_000_000_000
    triu = np.triu_indices(4)

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

    def newton_partial(t: pa.Table, *, w_ref) -> pa.Table:
        w = broadcast_get(w_ref)
        x, y = feats(t)
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        # quantize per ROW (layout-invariant), then exact int64 sums
        g = np.round((p - y)[:, None] * x * nano).astype(np.int64)
        wt = p * (1.0 - p)
        hrows = (x[:, triu[0]] * x[:, triu[1]]) * wt[:, None]
        hq = np.round(hrows * nano).astype(np.int64)
        return pa.table({
            "g": pa.array([g.sum(axis=0).tolist()], pa.list_(pa.int64())),
            "h": pa.array([hq.sum(axis=0).tolist()], pa.list_(pa.int64())),
        })

    w = np.zeros(4, dtype=np.float64)
    for _ in range(iters):
        ref = ray.put(w)
        parts = ds.map_batches(newton_partial, fn_kwargs={"w_ref": ref},
                               batch_format="pyarrow").to_pandas()
        g = np.sum([np.asarray(v, dtype=np.int64) for v in parts["g"]],
                   axis=0) / nano
        hu = np.sum([np.asarray(v, dtype=np.int64) for v in parts["h"]],
                    axis=0) / nano
        hess = np.zeros((4, 4))
        hess[triu] = hu
        hess.T[triu] = hu
        w = w - np.linalg.solve(hess + 1e-9 * np.eye(4), g)

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


def streaming_rescale_final(sf_dir: str) -> pd.DataFrame:
    """K->K' state rescale with an exact SQL oracle on the end state:
    a 4-shard run over the event stream is interrupted (last two
    manifests removed) and resumed with 8 shards — ``state/rescale.py``
    repartitions every keyed state family by the stable key hash — and
    the drained tumbling windows must STILL equal the plain batch
    aggregate over events. Asserts the rescale path actually fired."""
    import dataclasses

    from ..pipelines.flagship import run_flagship
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink
    from ..sources.events_log import events_pages_log

    cfg4 = _events_window_cfg(state_shards=4)
    data_dir = events_pages_log(sf_dir, "rescfinal")
    out = f"{data_dir}_out"
    import shutil as _shutil
    _shutil.rmtree(out, ignore_errors=True)
    run_flagship(data_dir, out, config=cfg4, resume=False)
    sink = EpochSink(out)
    for e in sink.committed_epochs()[-2:]:  # force a mid-stream resume
        os.remove(sink.manifest_path(e))
    cfg8 = dataclasses.replace(cfg4, state_shards=8)
    summary = run_flagship(data_dir, out, config=cfg8, resume=True)
    if summary["metrics"]["counters"].get("state_rescales") != 1:
        raise AssertionError("rescaled resume did not trigger")
    res = read_output_compacted(sink, "tumbling_lang").to_pandas()
    res = _win_us(res)
    return res.sort_values(["key", "window_start"]).reset_index(drop=True)


def streaming_kitchen_sink_final(sf_dir: str) -> pd.DataFrame:
    """Every streaming feature AT ONCE, one exact oracle — the
    interaction test the per-feature finals cannot see: update-mode
    corrections over deterministically 5-day-late rows, early-fire
    previews, per-partition watermarks, a forced mid-stream 4 -> 8
    shard RESCALE resume, and post-drain compaction on the resumed
    run. The consumer-corrected tumbling view after the drain must
    still equal the plain batch aggregate over ALL events. In-entry
    asserts each feature actually fired (>=1 committed revision,
    >=1 preview, exactly one rescale)."""
    import dataclasses

    from ..pipelines.flagship import (read_windows_corrected,
                                      run_flagship)
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink
    from ..sources.events_log import events_pages_log

    cfg4 = _events_window_cfg(state_shards=4, update_mode=True,
                              update_horizon_s=40 * 86400,
                              dedup_window_s=40 * 86400,
                              early_fire=True,
                              per_partition_watermark=True)
    data_dir = events_pages_log(sf_dir, "sinkfinal", late_mod=50,
                                late_delay_s=5 * 86400)
    out = f"{data_dir}_out"
    import shutil as _shutil
    _shutil.rmtree(out, ignore_errors=True)
    run_flagship(data_dir, out, config=cfg4, resume=False)
    sink = EpochSink(out)
    for e in sink.committed_epochs()[-2:]:  # force a mid-stream resume
        os.remove(sink.manifest_path(e))
    cfg8 = dataclasses.replace(cfg4, state_shards=8,
                               compact_after_drain=True)
    summary = run_flagship(data_dir, out, config=cfg8, resume=True)
    if summary["metrics"]["counters"].get("state_rescales") != 1:
        raise AssertionError("rescaled resume did not trigger")
    if not len(read_output_compacted(sink, "window_updates")):
        raise AssertionError("update mode emitted no corrections")
    if not len(read_output_compacted(sink, "window_early")):
        raise AssertionError("early firing emitted no previews")
    res = read_windows_corrected(out)
    res = _win_us(res[["key", "window_start", "window_end",
                       "doc_count", "total_chars"]].copy())
    return res.sort_values(["key", "window_start"]).reset_index(drop=True)


def streaming_savepoint_final(sf_dir: str) -> pd.DataFrame:
    """Savepoint fork with an exact SQL oracle on the end state: export
    epoch 1's committed checkpoint from a finished run over the event
    stream, bootstrap a FRESH output dir from it, resume to the drain —
    the fork's tumbling windows must equal the plain batch aggregate
    over events (the fork replays no history yet loses no state)."""
    import shutil as _shutil

    from ..pipelines.flagship import run_flagship
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink
    from ..sources.events_log import events_pages_log
    from ..state.savepoint import export_savepoint, fork_from_savepoint

    cfg = _events_window_cfg()
    data_dir = events_pages_log(sf_dir, "spfinal")
    ref = f"{data_dir}_ref"
    _shutil.rmtree(ref, ignore_errors=True)
    run_flagship(data_dir, ref, config=cfg, resume=False)
    sp = f"{data_dir}_sp"
    _shutil.rmtree(sp, ignore_errors=True)
    export_savepoint(ref, sp, epoch=1)
    fork = f"{data_dir}_fork"
    _shutil.rmtree(fork, ignore_errors=True)
    fork_from_savepoint(sp, fork)
    run_flagship(data_dir, fork, config=cfg, resume=True)
    res = read_output_compacted(EpochSink(fork), "tumbling_lang").to_pandas()
    res = _win_us(res)
    return res.sort_values(["key", "window_start"]).reset_index(drop=True)


def streaming_quarantine_final(sf_dir: str) -> pd.DataFrame:
    """Poison-row DLQ, oracle-checked end state: rows with
    ``event_id % 7 == 5`` carry unparseable payloads, the engine
    quarantines them (F7/F8: PARSE_ERROR -> committed quarantine
    table, never a crash), and the drained DLQ must equal the SQL
    predicate over events — the quarantine output itself is the
    hash-checked frame, not just a counter. In-entry asserts the
    survivor count is complementary (no row lost, none double-kept)."""
    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink

    cfg = _events_window_cfg()
    out_dir = _events_stream_run(sf_dir, "dlqfinal", cfg, poison_mod=7)
    sink = EpochSink(out_dir)
    dlq = read_output_compacted(sink, "quarantine").to_pandas()
    pages = read_output_compacted(sink, "pages").to_pandas()
    total = len(pd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                columns=["event_id"]))
    if len(dlq) + len(pages) != total:
        raise AssertionError(
            f"DLQ {len(dlq)} + survivors {len(pages)} != {total}")
    dlq = dlq[["url", "warc_ts", "reason"]].copy()
    dlq["warc_ts"] = dlq["warc_ts"].astype("datetime64[us]")
    return dlq.sort_values(["url"]).reset_index(drop=True)


def streaming_idle_watermark_final(sf_dir: str) -> pd.DataFrame:
    """Idle-partition watermark exclusion, oracle-checked end state:
    one key-shard stream dies a quarter of the way in (absent from
    later epoch plans — a physical re-layout, the row set is intact);
    with ``watermark_idle_epochs=2`` the per-partition min-combine
    excludes it and the committed watermark keeps advancing, and the
    drained tumbling windows must STILL equal the plain batch
    aggregate over events. In-entry asserts the exclusion actually
    fired: the last pre-drain committed watermark is PAST the dead
    stream's frozen max (min-combine without exclusion would pin
    there)."""
    import glob as _glob

    from ..sinks.compaction import read_output_compacted
    from ..sinks.exactly_once import EpochSink
    from ..sources.events_log import events_pages_log
    from ..sources.pages import file_event_maxes

    cfg = _events_window_cfg(per_partition_watermark=True,
                             watermark_idle_epochs=2, files_per_epoch=1)
    out_dir = _events_stream_run(sf_dir, "idlefinal", cfg, idle_shard=3)
    data_dir = events_pages_log(sf_dir, "idlefinal", idle_shard=3)
    dead = _glob.glob(os.path.join(data_dir, "pages-*-03.parquet"))
    dead_max = max(mx for _, mx in file_event_maxes(dead))
    sink = EpochSink(out_dir)
    epochs = sink.committed_epochs()
    wm = sink.read_manifest(epochs[-2])["watermark_us"]  # last pre-drain
    if wm <= dead_max:
        raise AssertionError(
            f"idle exclusion never fired: wm {wm} <= dead max {dead_max}")
    res = read_output_compacted(sink, "tumbling_lang").to_pandas()
    res = _win_us(res)
    return res.sort_values(["key", "window_start"]).reset_index(drop=True)


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
    """Video frame-sample plumbing (rows-only): each video row
    flat-maps into frame rows whose payloads feed the image decoder —
    the compose-the-stages path a real frame-dedup pipeline takes.
    Cycles THREE wire formats: REAL uncompressed AVI, REAL compressed
    Motion-JPEG AVI (per-frame baseline JPEG), and the fake container.
    Keys derive from nation rows so the driver fixture is tiny."""
    from ..stages.multimodal import (DecodeImageStage, FrameSampleStage,
                                     encode_avi, fake_video)

    keys = _t(sf_dir, "nation", ["n_nationkey"]).to_pandas()[
        "n_nationkey"].tolist()

    def payload(k: int) -> bytes:
        w, h, n = 8 + k % 4, 6 + k % 3, 12 + k % 9
        if k % 3 == 2:
            return fake_video(w, h, n_frames=n, seed=k)
        rng = np.random.default_rng(k)
        frames = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
        return encode_avi(frames, fps=12,
                          codec="mjpg" if k % 3 else "raw")

    rows = [{"vid_id": int(k), "video": payload(int(k))} for k in keys]
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
    """Image-decode plumbing over a mixed corpus cycling FIVE wire
    formats — REAL baseline JPEG (T.81 DCT + Annex K Huffman), REAL
    PNG (zlib + scanline filters), REAL GIF89a (pure LZW), REAL
    uncompressed BMP (struct), and the deterministic fake container —
    plus a truncated-JPEG poison class, all decoding through the same
    sniffing stage (corrupt rows surface as null feature rows, F8
    quarantine; rows-only; only codecs needing ffmpeg remain stubs)."""
    from ..stages.multimodal import (DecodeImageStage, encode_bmp,
                                     encode_gif, encode_jpeg,
                                     encode_png, fake_image)

    keys = _t(sf_dir, "part", ["p_partkey"]).to_pandas()["p_partkey"].tolist()

    def payload(k: int) -> bytes:
        w, h = 8 + k % 8, 8 + k % 5
        m = k % 6
        if m == 3:
            return fake_image(w, h, seed=k)
        rng = np.random.default_rng(k)
        gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        if m == 5:  # corrupt-JPEG poison row -> quarantine, never crash
            whole = encode_jpeg(gray)
            return whole[: max(4, len(whole) // 2)]
        return (encode_png, encode_gif, encode_bmp, None,
                encode_jpeg)[m](gray)

    rows = [{"img_id": int(k), "image": payload(int(k))} for k in keys]
    ds = rd.from_items(rows)
    out = ds.map_batches(
        DecodeImageStage, fn_constructor_kwargs={"image_col": "image"},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 2),
    ).to_pandas()
    return out.sort_values("img_id").reset_index(drop=True)
