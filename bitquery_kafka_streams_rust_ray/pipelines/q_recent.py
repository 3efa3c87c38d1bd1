"""Later-round analytics additions: survival, drift, audits, forecasting backtests, CEP extensions and privacy checks.

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
from ..stages.hashing import add_shard_column, shard_of
from ..stages.timeops import US, column_ts_us, series_ts_us
from .q_relational import DAY_US, HOUR_US, _pairs_in_shards, _ppm, _t
from .q_breadth import _SAMPLE_MOD, _SAMPLE_MULT



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


def phash_neardup_lossy(sf_dir: str, max_hamming: int = 7) -> pd.DataFrame:
    """Cross-format LOSSY image near-duplicate detection: the corpus
    holds each photo TWICE — real BMP wire bytes and the photo's real
    baseline-JPEG re-encode (quality 85) — so the twins' pixels differ
    by quantization noise and their 64-bit average-hashes differ by a
    few bits. Exact-hash grouping (``phash_dedup_images``) cannot see
    these; this entry finds them the scale-correct way: pigeonhole
    banding (8 bands x 8 bits — any pair within hamming 7 shares at
    least one identical band) -> per-band bucket groupby -> in-bucket
    exact hamming verify -> distributed pair dedup. The CC-scale
    "same photo saved twice in different formats" curation case.
    Rows-only (binary corpus); the entry SELF-CHECKS recall: every
    BMP/JPEG sibling pair must be recovered."""
    from ..stages.multimodal import (PerceptualHashStage, encode_bmp,
                                     encode_jpeg)

    keys = _t(sf_dir, "part", ["p_partkey"]).to_pandas()["p_partkey"].tolist()

    def payload(k: int) -> bytes:
        # one DISTINCT photo per group g: a seeded coarse 4x4 pattern
        # upsampled to the frame (large-amplitude structure -> the
        # average-hash is unique per group and robust to JPEG noise)
        g = k // 2
        w, h = 16 + g % 9, 16 + g % 7
        coarse = np.random.default_rng(g).integers(
            0, 256, size=(8, 8), dtype=np.uint8)
        cell = (h + 7) // 8, (w + 7) // 8
        img = np.kron(coarse, np.ones(cell, np.uint8))[:h, :w]
        return encode_bmp(img) if k % 2 == 0 else encode_jpeg(img, 85)

    rows = [{"img_id": int(k), "image": payload(int(k))} for k in keys]
    hashed = rd.from_items(rows).map_batches(
        PerceptualHashStage, fn_constructor_kwargs={"image_col": "image"},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 2),
    )

    def bands(t: pa.Table) -> pa.Table:
        ph = t["phash"].to_numpy(zero_copy_only=False)
        keep = ~pd.isna(ph)
        ids = t["img_id"].to_numpy(zero_copy_only=False)[keep]
        hv = ph[keep].astype(np.int64).view(np.uint64)
        out_band, out_val, out_id, out_hash = [], [], [], []
        for b in range(8):
            out_band.append(np.full(len(hv), b, np.int64))
            out_val.append(((hv >> np.uint64(8 * b))
                            & np.uint64(0xFF)).astype(np.int64))
            out_id.append(ids)
            out_hash.append(hv.view(np.int64))
        return pa.table({
            "band": pa.array(np.concatenate(out_band)),
            "val": pa.array(np.concatenate(out_val)),
            "img_id": pa.array(np.concatenate(out_id).astype(np.int64)),
            "phash": pa.array(np.concatenate(out_hash)),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["img_id"].to_numpy(np.int64)
        hv = g["phash"].to_numpy(np.int64).view(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, hv = ids[order], hv[order]
        out_a, out_b, out_d = [], [], []
        bits = np.unpackbits(hv.view(np.uint8).reshape(len(hv), 8),
                             axis=1)
        for i in range(len(ids)):
            d = (bits[i] != bits[i + 1:]).sum(axis=1)
            m = np.nonzero(d <= max_hamming)[0]
            for j in m:
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + j])
                out_d.append(int(d[j]))
        return pd.DataFrame({"id_a": np.array(out_a, np.int64),
                             "id_b": np.array(out_b, np.int64),
                             "hamming": np.array(out_d, np.int64)})

    def first_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1]

    pairs = (hashed.map_batches(bands, batch_format="pyarrow")
             .groupby(["band", "val"])
             .map_groups(bucket_pairs, batch_format="pandas")
             .groupby(["id_a", "id_b"])  # a pair can match in >1 band
             .map_groups(first_pair, batch_format="pandas")
             .to_pandas())
    pairs = pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # recall self-check: every BMP/JPEG sibling (2g, 2g+1) that survived
    # hashing must be recovered as a pair
    sib = {(min(a, b), max(a, b)) for a, b in
           zip(pairs["id_a"], pairs["id_b"])}
    want = {(k, k + 1) for k in keys if k % 2 == 0 and (k + 1) in set(keys)}
    missing = want - sib
    if missing:
        raise AssertionError(
            f"lossy near-dup missed {len(missing)} sibling pairs "
            f"{sorted(missing)[:5]}")
    return pairs
