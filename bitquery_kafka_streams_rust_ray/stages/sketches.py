"""Mergeable sketches — the 100 TB path for distinct counts and
quantiles.

The exact operators (``distinct_users``: groupby + set union;
``percentiles_events``: per-group exact quantiles) move every distinct
value / every row through a shuffle. At 100 TB that's the dominant
exchange. The sketch variants keep the classic two-level shape the rest
of this engine uses — a per-batch PARTIAL that collapses each block to a
constant-size summary before the shuffle, then a per-group MERGE of
summaries — so the exchange volume is ``groups × sketch_size``
regardless of row count.

- :func:`hll_distinct` — HyperLogLog (Flajolet et al. 2007, the
  public-domain algorithm) with ``2**p`` one-byte registers; standard
  error ≈ 1.04/sqrt(2**p) (p=14 → ~0.8%). Registers merge by
  elementwise max, so partials combine associatively in any order /
  any cluster size.
- :func:`histogram_quantiles` — fixed-width histogram quantiles: pass 1
  is a cheap exact min/max aggregate per group (tiny result), pass 2
  bins every value into ``bins`` counts per group (np.bincount per
  batch), partial histograms add elementwise, and the quantile is read
  off the cumulative histogram. Error is bounded by one bin width of
  the group's range; deterministic by construction (no sampling).

Both emit their partial as a ``binary`` column riding a normal Ray Data
``groupby``; nothing driver-side grows with the data.

Reference parity note: the reference's only approximate structure is
the simulated health throughput EWMA (src/observability/health.rs) —
these sketches are north-rule additions for the training-data axis.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum


# --- shared 64-bit mix (splitmix64 — public-domain constant mix) --------

_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)
_SM_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uniform uint64 from uint64."""
    with np.errstate(over="ignore"):
        z = x + _SM_GOLDEN
        z = (z ^ (z >> np.uint64(30))) * _SM_C1
        z = (z ^ (z >> np.uint64(27))) * _SM_C2
        return z ^ (z >> np.uint64(31))


def _hash_column(values: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 hash of an arbitrary column, deterministic across
    processes (ints go through splitmix64; strings through the pinned
    SipHash in stages.hashing)."""
    from .hashing import hash_strings

    if pa.types.is_integer(values.type):
        raw = values.cast(pa.uint64()).to_numpy(zero_copy_only=False)
        return _splitmix64(np.ascontiguousarray(raw, dtype=np.uint64))
    return _splitmix64(
        hash_strings(values.to_numpy(zero_copy_only=False)))


# --- HyperLogLog --------------------------------------------------------


def _hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Dense register array from uint64 hashes: index = top p bits,
    register = 1 + leading-zero count of the remaining 64-p bits."""
    m = 1 << p
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = (hashes << np.uint64(p)) | np.uint64((1 << p) - 1)
    # leading zeros of `rest` via bit length: lz = 64 - bit_length
    bl = np.zeros_like(rest, dtype=np.int64)
    v = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        v[big] >>= np.uint64(shift)
    bl[v > 0] += 1
    rho = (64 - p - (bl - p)) + 1  # lz within the (64-p)-bit suffix + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting)
    correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = float(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting
    return est


def hll_distinct(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    p: int = 14,
    out_col: str = "approx_distinct",
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT value) per group.

    Per-batch partial: one ``2**p``-byte register array per group in
    the batch (constant size, independent of batch rows). Shuffle
    moves ``groups × blocks`` sketch rows; per-group merge is
    elementwise max. Exchange volume at 100 TB: ``groups × 16 KiB``
    per block — vs the exact operator's every-distinct-value."""

    def partial(t: pa.Table) -> pa.Table:
        hashes = _hash_column(t[value_col])
        groups = t[group_col].to_numpy(zero_copy_only=False)
        out_g, out_s = [], []
        for g in np.unique(groups):
            regs = _hll_registers(hashes[groups == g], p)
            out_g.append(g)
            out_s.append(regs.tobytes())
        return pa.table({group_col: pa.array(out_g),
                         "_sketch": pa.array(out_s, type=pa.binary())})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for blob in df["_sketch"]:
            np.maximum(regs, np.frombuffer(blob, dtype=np.uint8), out=regs)
        return pd.DataFrame({
            group_col: [df[group_col].iloc[0]],
            out_col: [int(round(_hll_estimate(regs)))],
        })

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(group_col)
           .map_groups(merge, batch_format="pandas")
           .to_pandas())
    out[out_col] = out[out_col].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)


# --- fixed-width histogram quantiles ------------------------------------


def histogram_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.95, 0.99),
    bins: int = 4096,
) -> pd.DataFrame:
    """Approximate per-group quantiles via mergeable fixed-width
    histograms. Two passes over the data (both streaming):

    1. exact per-group min/max (native Ray aggregate — tiny result,
       broadcast back to the binning stage);
    2. per-batch ``np.bincount`` into ``bins`` buckets per group →
       groupby merges histograms by elementwise add → quantile read
       from the cumulative histogram (lower bin edge, matching
       ``quantile_disc``'s lower-value convention within resolution).

    Max error per estimate = one bin width = group_range / bins.
    Deterministic: no sampling anywhere."""
    import ray

    ranges = (ds.groupby(group_col)
              .aggregate(Min(value_col, alias_name="_lo"),
                         Max(value_col, alias_name="_hi"))
              .to_pandas())
    lo = dict(zip(ranges[group_col], ranges["_lo"]))
    hi = dict(zip(ranges[group_col], ranges["_hi"]))
    ranges_ref = ray.put((lo, hi))

    def partial(t: pa.Table) -> pa.Table:
        lo_m, hi_m = ray.get(ranges_ref)
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        groups = t[group_col].to_numpy(zero_copy_only=False)
        out_g, out_h = [], []
        for g in np.unique(groups):
            v = vals[groups == g]
            glo, ghi = float(lo_m[g]), float(hi_m[g])
            width = (ghi - glo) or 1.0
            idx = np.minimum(
                ((v - glo) / width * bins).astype(np.int64), bins - 1)
            out_g.append(g)
            out_h.append(np.bincount(idx, minlength=bins)
                         .astype(np.int64).tobytes())
        return pa.table({group_col: pa.array(out_g),
                         "_hist": pa.array(out_h, type=pa.binary())})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df[group_col].iloc[0]
        hist = np.zeros(bins, dtype=np.int64)
        for blob in df["_hist"]:
            hist += np.frombuffer(blob, dtype=np.int64)
        glo, ghi = float(lo[g]), float(hi[g])
        width = (ghi - glo) or 1.0
        cum = np.cumsum(hist)
        total = cum[-1]
        row: dict = {group_col: g}
        for qv in quantiles:
            target = int(np.ceil(qv * total))
            b = int(np.searchsorted(cum, max(target, 1)))
            row[f"p{int(qv * 100)}"] = glo + b * (width / bins)
        return pd.DataFrame([row])

    # lo/hi captured by closure for merge (runs distributed via
    # map_groups; the dict is groups-sized, i.e. output-sized)
    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(group_col)
           .map_groups(merge, batch_format="pandas")
           .to_pandas())
    return out.sort_values(group_col).reset_index(drop=True)


# --- Bloom filter (distributed build, broadcast probe) ------------------


class BloomFilter:
    """Plain Bloom filter over uint64 hashes: ``nbits`` bit slots,
    ``k`` probes via double hashing (h1 + i*h2 — Kirsch-Mitzenmacher,
    the standard public construction). Mergeable by OR, so per-batch
    partial blooms fold associatively — the build side never collects
    raw keys anywhere."""

    def __init__(self, nbits: int, k: int, bits: np.ndarray | None = None):
        if nbits % 64:
            raise ValueError("nbits must be a multiple of 64")
        self.nbits, self.k = nbits, k
        self.words = (bits if bits is not None
                      else np.zeros(nbits // 64, dtype=np.uint64))

    @classmethod
    def sized(cls, n_items: int, fp_rate: float = 0.01) -> "BloomFilter":
        nbits = int(-n_items * np.log(fp_rate) / (np.log(2) ** 2))
        nbits = max(64, ((nbits + 63) // 64) * 64)
        k = max(1, int(round(nbits / max(1, n_items) * np.log(2))))
        return cls(nbits, k)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes
        h2 = _splitmix64(hashes) | np.uint64(1)  # odd -> full-period
        idx = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return (h1[None, :] + idx * h2[None, :]) % np.uint64(self.nbits)

    def add_hashes(self, hashes: np.ndarray) -> None:
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(hashes)
        bits = (self.words[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.nbits, other.k) != (self.nbits, self.k):
            raise ValueError("incompatible bloom parameters")
        np.bitwise_or(self.words, other.words, out=self.words)
        return self


def build_bloom(
    ds: ray.data.Dataset,
    key_col: str,
    n_items_hint: int,
    fp_rate: float = 0.01,
) -> BloomFilter:
    """Distributed Bloom build: each batch hashes its keys into a
    partial bloom, partials OR-fold on the driver — ``blocks × nbits/8``
    bytes move, never the keys themselves. The standard scale path for
    a semi-join whose allow-list is itself too big to broadcast raw."""
    proto = BloomFilter.sized(n_items_hint, fp_rate)
    nbits, k = proto.nbits, proto.k

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(nbits, k)
        bf.add_hashes(_hash_column(t[key_col]))
        return pa.table({"_bloom": pa.array([bf.words.tobytes()],
                                            type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = BloomFilter(nbits, k)
    for blob in parts["_bloom"]:
        out.merge(BloomFilter(nbits, k,
                              np.frombuffer(blob, dtype=np.uint64).copy()))
    return out


def bloom_semi_join(
    ds: ray.data.Dataset,
    bloom: BloomFilter,
    col: str,
    anti: bool = False,
) -> ray.data.Dataset:
    """Probe-side bloom pre-filter: broadcast the bit array once
    (``ray.put``), drop every row whose key can't be in the build side.
    Approximate on its own (FP rate lets ~fp_rate of non-members
    through; zero false negatives) — compose with an exact semi_join on
    the survivors when exactness is required; the bloom has already
    shrunk that join's input by the non-member fraction."""
    import ray as _ray

    words_ref = _ray.put(bloom.words)
    nbits, k = bloom.nbits, bloom.k

    def mask(t: pa.Table) -> pa.Table:
        bf = BloomFilter(nbits, k, _ray.get(words_ref))
        m = bf.contains_hashes(_hash_column(t[col]))
        return t.filter(pa.array(~m if anti else m))

    return ds.map_batches(mask, batch_format="pyarrow")


# --- Misra-Gries heavy hitters ------------------------------------------


def _mg_summarize(counts: dict, k: int) -> dict:
    """Shrink a counter dict to at most k entries, Misra-Gries style:
    subtract the (k+1)-th largest count from everything and drop
    non-positives. Each surviving estimate undercounts its true
    frequency by at most the subtracted amount (classic MG bound)."""
    if len(counts) <= k:
        return dict(counts)
    cut = sorted(counts.values(), reverse=True)[k]
    return {key: c - cut for key, c in counts.items() if c > cut}


def heavy_hitters(
    ds: ray.data.Dataset,
    value_col: str,
    k: int = 64,
    items_fn=None,
) -> pd.DataFrame:
    """Mergeable Misra-Gries heavy hitters over a column (or over
    items derived from it via ``items_fn(value) -> iterable``, e.g.
    token bigrams). Guarantees every item with true count
    > total/(k+1) survives; estimates undercount by at most
    total/(k+1). Per-batch summaries are ≤ k entries, merged summaries
    re-shrink to k — constant exchange volume regardless of rows, the
    frequency-sketch sibling of the HLL/histogram/Bloom family.

    Returns (item, approx_count) sorted by estimate descending —
    ``approx_count`` is an UNDER-estimate (MG semantics); rank ties are
    broken by item for determinism."""
    from collections import Counter

    def partial(t: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for v in t[value_col].to_pylist():
            if items_fn is None:
                counts[v] += 1
            else:
                counts.update(items_fn(v))
        summary = _mg_summarize(counts, k)
        return pa.table({
            "item": pa.array([str(key) for key in summary],
                             type=pa.string()),
            "c": pa.array(list(summary.values()), type=pa.int64()),
        })

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("item").aggregate(Sum("c", alias_name="c"))
             .to_pandas())
    # final shrink on the merged (item, summed-count) set — itself at
    # most k x blocks rows, output-sized
    final = _mg_summarize(dict(zip(parts["item"], parts["c"])), k)
    out = pd.DataFrame({"item": list(final.keys()),
                        "approx_count": list(final.values())})
    out["approx_count"] = out["approx_count"].astype("int64")
    return (out.sort_values(["approx_count", "item"],
                            ascending=[False, True])
            .reset_index(drop=True))


def _cms_positions(hashes: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(n, depth) column indexes via Kirsch-Mitzenmacher double
    hashing (h1 + i*h2, the same trick as :class:`BloomFilter`) — depth
    independent-enough rows from two uint64 hashes, no per-row loop."""
    h1 = hashes
    h2 = _splitmix64(hashes) | np.uint64(1)
    i = np.arange(depth, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(width)).astype(np.int64)


def cms_partial(values: pa.Array | pa.ChunkedArray,
                depth: int = 4, width: int = 2048) -> np.ndarray:
    """Count-min sketch of one batch: a (depth, width) int64 counter
    grid. Partials MERGE BY ELEMENTWISE ADDITION — the linearity that
    lets a 100-TB stream ride normal map_batches partials + one
    constant-size reduce, exactly like the HLL registers (
    max-merge) and the histogram bins (add-merge). Memory is
    depth*width*8 bytes per partial regardless of rows."""
    grid = np.zeros((depth, width), dtype=np.int64)
    pos = _cms_positions(_hash_column(values), depth, width)
    for r in range(depth):  # depth is 4: four bincount passes, no row loop
        grid[r] += np.bincount(pos[:, r], minlength=width)
    return grid


def cms_query(grid: np.ndarray, keys: pa.Array) -> np.ndarray:
    """Point-estimate counts for ``keys``: min over the depth rows —
    NEVER an underestimate (every row counts the key plus collisions),
    and ≤ true + e*N/width with probability 1 - exp(-depth) (the
    classic CM guarantee)."""
    depth, width = grid.shape
    pos = _cms_positions(_hash_column(keys), depth, width)
    ests = np.stack([grid[r, pos[:, r]] for r in range(depth)], axis=1)
    return ests.min(axis=1)


def cms_counts(
    ds: ray.data.Dataset,
    value_col: str,
    probe_keys: list,
    depth: int = 4,
    width: int = 2048,
) -> pd.DataFrame:
    """Distributed count-min frequency estimation: per-block sketch
    partials flow as flattened rows through ONE constant-size groupby
    (depth*width cells per block, summed cell-wise — the add-merge
    linearity), then the probe keys read the merged grid. The stream
    itself never shuffles and the exchange volume is independent of
    row count — the designed 100-TB path for "how often does key X
    occur" when the key domain is too large for an exact groupby."""
    def partial(t: pa.Table) -> pa.Table:
        grid = cms_partial(t[value_col], depth, width)
        cell = np.arange(depth * width, dtype=np.int64)
        return pa.table({"cell": cell, "c": grid.ravel()})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("cell").aggregate(Sum("c", alias_name="c"))
              .to_pandas().sort_values("cell"))
    grid = np.zeros(depth * width, dtype=np.int64)
    grid[merged["cell"].to_numpy(np.int64)] = merged["c"].to_numpy(np.int64)
    grid = grid.reshape(depth, width)
    keys = pa.array([str(k) for k in probe_keys], pa.string())
    est = cms_query(grid, keys)
    return pd.DataFrame({"item": [str(k) for k in probe_keys],
                         "approx_count": est.astype("int64")})


# --------------------------- t-digest ---------------------------------
#
# Mergeable quantile sketch for UNBOUNDED real domains — the companion
# to histogram_quantiles (which needs a known finite range). Clustering
# variant: values sort once per block, each lands in the cluster whose
# index is floor(k(q)) under the k1 scale function
# k(q) = (delta / 2pi) * asin(2q - 1), so clusters are tiny at the tails
# and wide in the middle (relative tail accuracy ~ 1/delta). Centroids
# are (mean, weight) pairs; merging concatenates centroid sets and
# re-clusters — the whole pipeline is numpy-vectorized, no row loops.


def _k1_cluster(means: np.ndarray, weights: np.ndarray,
                delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Compress sorted-by-construction (value, weight) points into k1
    clusters. Inputs need not be sorted; output is sorted by mean."""
    order = np.argsort(means, kind="mergesort")
    m, w = means[order].astype(np.float64), weights[order].astype(np.float64)
    n = w.sum()
    if n <= 0:
        return np.array([], np.float64), np.array([], np.float64)
    q = (np.cumsum(w) - 0.5 * w) / n  # centroid midpoint quantiles
    k = np.floor(delta / (2.0 * np.pi)
                 * (np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))
                    + np.pi / 2.0)).astype(np.int64)
    # segment-reduce by cluster id (k is nondecreasing since q is)
    first = np.concatenate([[True], k[1:] != k[:-1]])
    seg = np.cumsum(first) - 1
    n_seg = int(seg[-1]) + 1
    wsum = np.bincount(seg, weights=w, minlength=n_seg)
    msum = np.bincount(seg, weights=m * w, minlength=n_seg)
    return msum / wsum, wsum


def tdigest_quantile(means: np.ndarray, weights: np.ndarray,
                     qs: np.ndarray) -> np.ndarray:
    """Read quantiles from a digest by linear interpolation between
    centroid means at their cumulative-weight midpoints."""
    n = weights.sum()
    mid = (np.cumsum(weights) - 0.5 * weights) / n
    return np.interp(np.asarray(qs, np.float64), mid, means)


def tdigest_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    delta: int = 200,
) -> pd.DataFrame:
    """Distributed per-group quantiles via t-digest: one pass builds a
    <=~delta-centroid digest per (block, group); a single groupby ships
    the constant-size centroid lists to each group's reducer, which
    re-clusters the union and reads the quantiles. No range pre-pass
    (unlike histogram_quantiles) and no value-domain assumption — the
    designed 100-TB path for long-tailed or unbounded metrics."""
    def partial(t: pa.Table) -> pa.Table:
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        groups = t[group_col].to_numpy(zero_copy_only=False)
        out_g, out_m, out_w = [], [], []
        for g in np.unique(groups):
            v = vals[groups == g]
            m, w = _k1_cluster(v, np.ones_like(v), delta)
            out_g.append(g)
            out_m.append(m.tolist())
            out_w.append(w.tolist())
        return pa.table({group_col: pa.array(out_g),
                         "_m": pa.array(out_m, pa.list_(pa.float64())),
                         "_w": pa.array(out_w, pa.list_(pa.float64()))})

    def reduce_group(df: pd.DataFrame) -> pd.DataFrame:
        m = np.concatenate([np.asarray(x, np.float64) for x in df["_m"]])
        w = np.concatenate([np.asarray(x, np.float64) for x in df["_w"]])
        m, w = _k1_cluster(m, w, delta)
        est = tdigest_quantile(m, w, np.asarray(quantiles))
        row = {group_col: df[group_col].iloc[0],
               "n_centroids": np.int64(len(m))}
        for q, e in zip(quantiles, est):
            row[f"p{int(q * 100):02d}"] = float(e)
        return pd.DataFrame([row])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(group_col)
           .map_groups(reduce_group, batch_format="pandas")
           .to_pandas())
    return out.sort_values(group_col).reset_index(drop=True)
