"""Training-data ops: scrubbing, n-gram statistics, quality scoring, chunking, packing, splits, balancing and curation.

Split from the former monolithic ``pipelines/queries.py`` (round 4); the ``queries`` shim
re-exports every entry, so importers are unaffected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Min, Sum
from ..stages.broadcast import broadcast_get
from ..stages.dedup import exact_dedup
from ..stages.hashing import add_shard_column
from ..stages.join import hash_join, join_buckets
from ..stages.neardup import component_labels
from .q_relational import _t, _tbytes



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
