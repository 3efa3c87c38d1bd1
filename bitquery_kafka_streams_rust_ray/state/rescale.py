"""Repartition checkpointed shard state across a different shard count.

The N -> 4N cluster-resize path of the north rule: a run checkpointed
with K state shards must be resumable on a cluster sized for K' shards
(scale a stalled backfill up, or a drained one down) without replaying
from epoch 0. Every keyed state family in this engine is owner-addressed
by the SAME stable hash (``stages.hashing.shard_of(key, K)``), so
rescaling is a pure repartition:

1. one task per OLD snapshot file splits every component's entries by
   ``shard_of(key, K')`` (disk-backed dedup B-trees are streamed row
   chunk by row chunk into per-owner fragment sqlite files — actor and
   task RAM stay bounded by the chunk, never the key domain);
2. each NEW shard merges its K fragments.

Keys are disjoint across old shards (each key lived on exactly one),
so the merge never reconciles conflicting entries — it is plain
insertion, and the resumed run's logical output is bit-identical to an
un-rescaled resume: window/session/funnel/top-k emissions are sorted
globally by the driver, dedup keep-decisions are per-key, and only the
per-shard page-file *layout* changes.

Analog in the reference: Kafka consumer-group rebalancing reassigns
partitions to a resized consumer set while committed offsets keep their
meaning (``src/consumer.rs`` group semantics) — here the "partitions"
are key-hash shards and the "offsets" are the per-epoch state snapshots.
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np

from ..stages.hashing import shard_of

_CHUNK = 100_000  # rows per streamed sqlite fetch/insert


def _owners(keys, new_shards: int) -> np.ndarray:
    if not keys:
        return np.empty(0, dtype=np.int64)
    return shard_of(np.asarray(list(keys), dtype=object), new_shards)


def _split_dict(d: dict, new_shards: int) -> list[dict]:
    """Split a key->value dict by the new owner of each key."""
    out: list[dict] = [{} for _ in range(new_shards)]
    keys = list(d.keys())
    for key, owner in zip(keys, _owners(keys, new_shards)):
        out[owner][key] = d[key]
    return out


def _split_rows(rows: list, key_at, new_shards: int) -> list[list]:
    """Split a row list by the new owner of ``key_at(row)``."""
    out: list[list] = [[] for _ in range(new_shards)]
    if not rows:
        return out
    owners = _owners([key_at(r) for r in rows], new_shards)
    for row, owner in zip(rows, owners):
        out[owner].append(row)
    return out


def _fragment_db(scratch_dir: str, old_shard: int, new_shard: int) -> str:
    return os.path.join(scratch_dir,
                        f"dedup-{old_shard:04d}-to-{new_shard:04d}.sqlite")


def _stream_split_sqlite(con: sqlite3.Connection, new_shards: int,
                         scratch_dir: str, old_shard: int) -> list[dict]:
    """Stream a dedup B-tree into per-owner fragment sqlite files,
    ``_CHUNK`` rows at a time — never the whole key domain in RAM."""
    frag_cons: dict[int, sqlite3.Connection] = {}
    frag_paths: dict[int, str] = {}

    def frag_con(j: int) -> sqlite3.Connection:
        c = frag_cons.get(j)
        if c is None:
            path = _fragment_db(scratch_dir, old_shard, j)
            if os.path.exists(path):
                os.remove(path)
            c = frag_cons[j] = sqlite3.connect(path)
            frag_paths[j] = path
            c.execute("PRAGMA journal_mode=OFF")
            c.execute("PRAGMA synchronous=OFF")
            c.execute("CREATE TABLE kv (k TEXT PRIMARY KEY, "
                      "ts INTEGER NOT NULL) WITHOUT ROWID")
        return c

    cur = con.execute("SELECT k, ts FROM kv")
    while True:
        rows = cur.fetchmany(_CHUNK)
        if not rows:
            break
        owners = _owners([r[0] for r in rows], new_shards)
        for j in np.unique(owners):
            chunk = [rows[i] for i in np.nonzero(owners == j)[0]]
            frag_con(int(j)).executemany("INSERT INTO kv VALUES (?, ?)",
                                         chunk)
    for c in frag_cons.values():
        c.commit()
        c.close()
    return [
        {"db_fragment": frag_paths[j]} if j in frag_paths else {}
        for j in range(new_shards)
    ]


def _split_dedup(snap: dict, new_shards: int, sidecar_dir: str | None,
                 scratch_dir: str, old_shard: int) -> list[dict]:
    """Split one dedup snapshot (any backend form) into fragments:
    ``{"window_us", "last_seen": {...}}`` for dict-backed state,
    ``{"window_us", "db_fragment": path}`` for streamed B-trees."""
    w = snap["window_us"]
    if "last_seen" in snap:
        parts = _split_dict(snap["last_seen"], new_shards)
        return [{"window_us": w, "last_seen": p} for p in parts]
    if "db_sidecar" in snap:
        if sidecar_dir is None:
            raise ValueError("sidecar dedup snapshot needs its epoch dir")
        con = sqlite3.connect(
            os.path.join(sidecar_dir, snap["db_sidecar"]))
    else:  # in-blob sqlite image
        con = sqlite3.connect(":memory:")
        con.deserialize(snap["db"])
    try:
        frags = _stream_split_sqlite(con, new_shards, scratch_dir,
                                     old_shard)
    finally:
        con.close()
    return [{"window_us": w, **f} for f in frags]


def split_snapshot(snap: dict, new_shards: int, sidecar_dir: str | None,
                   scratch_dir: str, old_shard: int) -> list[dict]:
    """Split one old shard's full snapshot into ``new_shards`` fragments
    (complete fragment dicts for every new owner, empty where the old
    shard held no keys for it)."""
    dedup = _split_dedup(snap["dedup"], new_shards, sidecar_dir,
                         scratch_dir, old_shard)
    win = snap["windows"]
    acc = _split_rows(win["acc"], lambda r: r[0][1], new_shards)
    closed = _split_rows(win.get("closed", []), lambda r: r[0][1],
                         new_shards)
    dirty = _split_rows(win.get("dirty", []), lambda k: k[1], new_shards)
    sess = snap["sessions"]
    sessions = _split_dict(sess["sessions"], new_shards)
    # update-mode session fields: retained emissions (dict by key) and
    # the pending retract/add changelog (rows keyed by row[0])
    sess_closed = _split_dict(sess.get("closed", {}), new_shards)
    sess_upd = _split_rows(sess.get("updates", []), lambda r: r[0],
                           new_shards)
    fun = snap.get("funnel")
    if fun is not None:
        chains = _split_dict(fun["chains"], new_shards)
        pending = _split_dict(fun["pending"], new_shards)
        done = _split_rows(list(fun["done"]), lambda k: k, new_shards)
        # CEP extension state: pending timeout rows move with their key;
        # the scalar veto count (not key-attributable) rides on shard 0
        funto = _split_rows(fun.get("timeouts", []), lambda r: r[0],
                            new_shards)
    tk = snap.get("topk")
    counts = _split_dict(tk["counts"], new_shards) if tk is not None else None
    iv = snap.get("intervals")
    if iv is not None:
        iv_bufs = _split_dict(iv["buffers"], new_shards)
        iv_pairs = _split_rows(iv["pairs"], lambda r: r[0], new_shards)
    di = snap.get("distinct")
    drows = (_split_rows(di["rows"], lambda r: r[0], new_shards)
             if di is not None else None)

    frags = []
    for j in range(new_shards):
        frags.append({
            "dedup": dedup[j],
            "windows": {"acc": acc[j], "closed": closed[j],
                        "dirty": dirty[j]},
            "sessions": {"gap_us": sess["gap_us"], "sessions": sessions[j],
                         "update_horizon_us":
                             sess.get("update_horizon_us", 0),
                         "closed": sess_closed[j],
                         "updates": sess_upd[j]},
            "funnel": (None if fun is None else
                       {"n": fun["n"], "within_us": fun["within_us"],
                        "veto_stage": fun.get("veto_stage"),
                        "emit_timeouts": fun.get("emit_timeouts", False),
                        "vetoes": (fun.get("vetoes", 0) if j == 0 else 0),
                        "timeouts": funto[j],
                        "chains": chains[j], "pending": pending[j],
                        "done": done[j]}),
            "topk": (None if tk is None else
                     {"k": tk["k"], "max_keys": tk.get("max_keys", 0),
                      "counts": counts[j]}),
            "intervals": (None if iv is None else
                          {"bound_us": iv["bound_us"],
                           "buffers": iv_bufs[j], "pairs": iv_pairs[j]}),
            "distinct": (None if di is None else
                         {"p": di["p"], "rows": drows[j]}),
        })
    return frags


def merge_fragments(frags: list[dict]) -> dict:
    """Merge per-new-shard fragments (one from each old shard) into a
    single snapshot in the exact format ``StateShard.restore`` takes —
    except ``dedup``, which may carry ``db_fragment`` paths and is
    merged by ``build_dedup``. Keys are disjoint across fragments, so
    every merge is plain insertion/concatenation."""
    out = {
        "windows": {"acc": [], "closed": [], "dirty": []},
        "sessions": {"gap_us": frags[0]["sessions"]["gap_us"],
                     "update_horizon_us":
                         frags[0]["sessions"].get("update_horizon_us", 0),
                     "sessions": {}, "closed": {}, "updates": []},
        "funnel": None,
        "topk": None,
        "distinct": None,
        "intervals": None,
    }
    for f in frags:
        w = f["windows"]
        out["windows"]["acc"].extend(w["acc"])
        out["windows"]["closed"].extend(w["closed"])
        out["windows"]["dirty"].extend(w["dirty"])
        out["sessions"]["sessions"].update(f["sessions"]["sessions"])
        out["sessions"]["closed"].update(f["sessions"].get("closed", {}))
        out["sessions"]["updates"].extend(f["sessions"].get("updates", []))
        fun = f.get("funnel")
        if fun is not None:
            o = out["funnel"]
            if o is None:
                o = out["funnel"] = {"n": fun["n"],
                                     "within_us": fun["within_us"],
                                     "veto_stage": fun.get("veto_stage"),
                                     "emit_timeouts":
                                         fun.get("emit_timeouts", False),
                                     "vetoes": 0, "timeouts": [],
                                     "chains": {}, "pending": {},
                                     "done": []}
            o["vetoes"] += fun.get("vetoes", 0)
            o["timeouts"].extend(fun.get("timeouts", []))
            o["chains"].update(fun["chains"])
            o["pending"].update(fun["pending"])
            o["done"].extend(fun["done"])
        tk = f.get("topk")
        if tk is not None:
            o = out["topk"]
            if o is None:
                o = out["topk"] = {"k": tk["k"],
                                   "max_keys": tk.get("max_keys", 0),
                                   "counts": {}}
            o["counts"].update(tk["counts"])
        di = f.get("distinct")
        if di is not None:
            o = out["distinct"]
            if o is None:
                o = out["distinct"] = {"p": di["p"], "rows": []}
            o["rows"].extend(di["rows"])
        iv = f.get("intervals")
        if iv is not None:
            o = out["intervals"]
            if o is None:
                o = out["intervals"] = {"bound_us": iv["bound_us"],
                                        "buffers": {}, "pairs": []}
            o["buffers"].update(iv["buffers"])
            o["pairs"].extend(iv["pairs"])
    if out["funnel"] is not None:
        out["funnel"]["done"] = sorted(out["funnel"]["done"])
    if out["distinct"] is not None:
        out["distinct"]["rows"].sort(key=lambda r: (r[0], r[1]))
    return out


def build_dedup(dedup_frags: list[dict], db_path: str | None):
    """Construct the new shard's dedup backend from its fragments.

    Dict fragments bulk-insert; sqlite fragments stream chunk by chunk
    (``ATTACH`` would also work, but a streamed ``INSERT`` keeps one
    code path for both the file-backed and ``:memory:`` targets). The
    backend follows the NEW config: ``db_path`` set -> spill-backed,
    else the in-memory dict store."""
    from .store import DedupState, SpillDedupState

    window_us = dedup_frags[0]["window_us"]
    has_db = any("db_fragment" in f for f in dedup_frags)
    if db_path is None and not has_db:
        st = DedupState(window_us)
        for f in dedup_frags:
            st.last_seen.update(f.get("last_seen", {}))
        return st
    st = SpillDedupState(window_us, db_path)
    for f in dedup_frags:
        items = f.get("last_seen")
        if items:
            st.con.executemany(
                "INSERT OR REPLACE INTO kv VALUES (?, ?)", items.items())
        frag_path = f.get("db_fragment")
        if frag_path:
            src = sqlite3.connect(frag_path)
            try:
                cur = src.execute("SELECT k, ts FROM kv")
                while True:
                    rows = cur.fetchmany(_CHUNK)
                    if not rows:
                        break
                    st.con.executemany(
                        "INSERT OR REPLACE INTO kv VALUES (?, ?)", rows)
            finally:
                src.close()
    st.con.commit()
    # fragments bypass process(), so seed the O(1) size counter once
    # (keys are disjoint across fragments — a plain count is exact)
    st._nkeys = st.con.execute("SELECT count(*) FROM kv").fetchone()[0]
    return st
