"""Statistical analytics: window functions, distribution tests, correlations, concentration/outlier measures.

Split from the former monolithic ``pipelines/queries.py`` (round 4); the ``queries`` shim
re-exports every entry, so importers are unaffected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Max, Min, Sum
from ..stages.broadcast import broadcast_get
from ..stages.hashing import add_shard_column
from ..stages.join import (broadcast_asof_join,
    broadcast_join,
    hash_join,
    join_buckets)
from ..stages.timeops import (US,
    column_ts_us,
    series_ts_us,
    us_to_timestamp_array)
from .q_relational import HOUR_US, _pairs_in_shards, _ppm, _t, _tbytes
from .q_training import _word_pairs



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
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def bigram_tf(t: pa.Table) -> pa.Table:
        """(doc_id, bigram, w1, tf) rows — tf is complete per doc.
        Fully vectorized (no per-doc loop): one regex split to a
        ListArray, adjacent-pair join via offset arithmetic on the
        flattened tokens, then one np.unique over composite
        (doc, bigram-code) int64 keys for the per-doc counts —
        same plan token_entropy_documents uses.  \\x1f joins the
        pair (the oracle tokenizes on \\s+, so no token contains
        it in any input both sides agree on)."""
        trimmed = pc.utf8_trim_whitespace(t["text"])
        keep = pc.not_equal(trimmed, "")
        doc_id = t["doc_id"].filter(keep).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern_regex(trimmed.filter(keep),
                                      r"\s+").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        n_flat = len(flat)
        if n_flat < 2:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "bigram": pa.array([], pa.string()),
                             "w1": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        # token position i starts a bigram iff i is not the last
        # token of its doc (every kept doc has >=1 token)
        valid = np.ones(n_flat, dtype=bool)
        valid[np.cumsum(lens) - 1] = False
        pos = np.nonzero(valid[:-1])[0]
        left = flat.take(pa.array(pos))
        right = flat.take(pa.array(pos + 1))
        bigram = pc.binary_join_element_wise(left, right, "\x1f")
        bg_doc = np.repeat(np.arange(len(lens), dtype=np.int64),
                           lens)[pos]
        enc = pc.dictionary_encode(bigram)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        vocab = int(codes.max()) + 1 if len(codes) else 1
        keys, first_idx, counts = np.unique(
            bg_doc * vocab + codes, return_index=True,
            return_counts=True)
        uniq_pos = pa.array(first_idx)
        return pa.table({
            "doc_id": pa.array(doc_id[keys // vocab]),
            "bigram": bigram.take(uniq_pos),
            "w1": left.take(uniq_pos),
            "tf": pa.array(counts.astype(np.int64))})

    # materialize the tf frame once (object-store-backed, spillable):
    # both the corpus-count reduce and the per-doc scoring pass consume
    # it, and without the pin Ray's lineage would re-run the tokenize
    # for each consumer
    tf = docs.map_batches(bigram_tf, batch_format="pyarrow").materialize()
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
