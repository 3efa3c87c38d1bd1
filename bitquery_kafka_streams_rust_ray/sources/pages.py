"""Deterministic synthetic ``pages`` + ``host_metadata`` generator.

Produces the input shape mandated by ``BASELINE.json``'s ``input_hint``:

    pages(url: string, warc_ts: timestamp[us], html: large_binary,
          text: string, lang: string)

laid out as a partitioned log: files named ``pages-{slice:04d}-{shard:02d}
.parquet`` where *slice* is the arrival-order micro-batch (the Kafka
"offset range" analog) and *shard* is ``crc32(url) % shards`` (the
partition-by-key analog). The streaming driver consumes slice by slice.

Everything is a pure function of the seed (fixed RNG, gzip mtime pinned,
LZ4 deterministic), per FIXTURES.md. Baked-in fixture cases (reserved
``/fixtures/...`` url paths) cover: duplicates within/outside the dedup
window, text-length threshold boundaries, malformed payloads, very-late
rows, a hot host (~30% of traffic) for skew, and a session-gap sequence.

The ``html`` column is one-third raw, one-third size-prepended-LZ4 and
one-third gzip, mirroring the reference's 3-way ``decompress_safe``
sniffing (reference ``src/core/utils/compression.rs:54-94``); the
``text`` column holds the expected extraction for the byte-identical
text-per-url invariant.
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pandas as pd
import pyarrow.parquet as pq

from ..functions.compression import compress_gzip, compress_lz4
from ..functions.extract import html_to_text, text_to_html

# Characteristic per-language vocabularies (ASCII-only for byte-stable
# fixtures; each language's common function words appear with high
# frequency so the n-gram/stopword language-ID heuristic has signal).
LANG_VOCAB: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was",
           "data", "stream", "engine", "window", "batch", "page", "crawl",
           "index", "query", "shard"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von",
           "zu", "daten", "strom", "seite", "fenster", "anfrage", "menge",
           "teil", "wert", "zeit", "netz"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "pour",
           "que", "donnees", "flux", "page", "fenetre", "requete", "valeur",
           "temps", "reseau", "partie", "indice"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "una", "por", "con",
           "datos", "flujo", "pagina", "ventana", "consulta", "valor",
           "tiempo", "red", "parte", "indice"],
    "ja": ["no", "ni", "wa", "wo", "ga", "de", "to", "mo", "kara", "made",
           "deeta", "nagare", "peeji", "mado", "toiawase", "atai", "jikan",
           "ami", "bubun", "sakuin"],
}
LANGS = list(LANG_VOCAB)
LANG_WEIGHTS = [0.50, 0.14, 0.12, 0.13, 0.11]

EPOCH_2025_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds

SESSION_HOST = "session.example.com"
HOT_HOST = "host-000.example.com"

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.large_binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def url_shard(url: str, shards: int) -> int:
    """Stable key partitioner (NOT python ``hash``, which is salted)."""
    return zlib.crc32(url.encode("utf-8")) % shards


@dataclass(frozen=True)
class PagesSpec:
    num_rows: int = 2_000
    seed: int = 42
    num_slices: int = 8           # arrival micro-batches (epoch granularity)
    shards: int = 4               # key-partition files per slice
    num_hosts: int = 200
    hot_host_frac: float = 0.30   # FIXTURES.md case 6 (skew)
    span_s: int = 1800            # event-time span of the whole log
    lateness_s: int = 120         # bounded disorder bound
    very_late_frac: float = 0.005 # rows with disorder > lateness
    dedup_window_s: int = 300
    session_gap_s: int = 180
    null_lang_frac: float = 0.004
    malformed_frac: float = 0.004
    start_ts_us: int = EPOCH_2025_US
    words_per_page: tuple[int, int] = (8, 96)
    threshold_len: int = 64       # FIXTURES.md case 3 boundary length
    fixture_pairs: int = field(default=8)  # dup pairs per dup fixture kind


def _host_name(idx: int) -> str:
    return f"host-{idx:03d}.example.com"


def generate_pages(out_dir: str, spec: PagesSpec = PagesSpec()) -> dict:
    """Write the pages log under ``out_dir``; returns a summary manifest.

    Deterministic in ``spec`` alone. Rows are generated in arrival order
    and written slice-major / shard-minor, preserving arrival order
    inside every file.
    """
    rng = np.random.default_rng(spec.seed)
    n = spec.num_rows
    os.makedirs(out_dir, exist_ok=True)

    # --- hosts: one hot host + zipf tail (skew block, FIXTURES case 6)
    tail_w = 1.0 / np.power(np.arange(1, spec.num_hosts, dtype=np.float64), 1.1)
    tail_p = (1.0 - spec.hot_host_frac) * tail_w / tail_w.sum()
    host_p = np.concatenate([[spec.hot_host_frac], tail_p])
    host_idx = rng.choice(spec.num_hosts, size=n, p=host_p)

    # --- langs (a few nulls exercise missing-field rejection, case 4)
    lang_idx = rng.choice(len(LANGS), size=n, p=LANG_WEIGHTS)
    null_lang = rng.random(n) < spec.null_lang_frac

    # --- event time: evenly spaced ideal arrival, bounded disorder
    span_us = spec.span_s * 1_000_000
    ideal = spec.start_ts_us + (np.arange(n, dtype=np.int64) * span_us) // max(n, 1)
    disorder = (rng.random(n) * spec.lateness_s * 1_000_000).astype(np.int64)
    very_late = rng.random(n) < spec.very_late_frac
    extra = ((1.0 + 2.0 * rng.random(n)) * spec.lateness_s * 1_000_000).astype(np.int64)
    disorder = np.where(very_late, disorder + extra, disorder)
    warc_ts = ideal - disorder

    # --- body text: per-lang vocab draws
    n_words = rng.integers(spec.words_per_page[0], spec.words_per_page[1] + 1, size=n)
    word_draws = rng.integers(0, 20, size=int(n_words.sum()))
    malformed = rng.random(n) < spec.malformed_frac

    urls: list[str] = [""] * n
    texts: list[str] = [""] * n
    htmls: list[bytes] = [b""] * n
    langs: list[str | None] = [None] * n

    pos = 0
    for i in range(n):
        k = int(n_words[i])
        vocab = LANG_VOCAB[LANGS[lang_idx[i]]]
        words = [vocab[j] for j in word_draws[pos:pos + k]]
        pos += k
        body = " ".join(words)
        title = " ".join(words[:2])
        host = _host_name(int(host_idx[i]))
        urls[i] = f"https://{host}/p/{i:08x}{int(rng.integers(0, 1 << 32)):08x}"
        langs[i] = None if null_lang[i] else LANGS[lang_idx[i]]
        if malformed[i]:
            # undecodable payload -> extraction quarantines to "" (case 4)
            htmls[i] = b"\xff\xfe" + bytes(rng.integers(0, 256, size=24, dtype=np.uint8))
            texts[i] = ""
        else:
            htmls[i] = text_to_html(body, title)
            texts[i] = f"{title} {title} {body}".strip() if title else body

    _apply_fixtures(spec, rng, urls, warc_ts, htmls, texts, langs)

    # spot-check the self-consistency of the text oracle
    for i in range(0, n, max(1, n // 50)):
        assert html_to_text(htmls[i]) == texts[i], f"oracle drift at row {i}"

    # --- compression: round-robin raw / lz4 / gzip (cases mirror M1-M3)
    for i in range(n):
        mode = i % 3
        if mode == 1 and htmls[i]:
            htmls[i] = compress_lz4(htmls[i])
        elif mode == 2 and htmls[i]:
            htmls[i] = compress_gzip(htmls[i])

    # --- write slice-major, shard-minor, arrival order preserved
    shard_of = np.fromiter(
        (url_shard(u, spec.shards) for u in urls), dtype=np.int64, count=n
    )
    slice_of = np.minimum(
        (np.arange(n, dtype=np.int64) * spec.num_slices) // max(n, 1),
        spec.num_slices - 1,
    )
    files = []
    ts_arr = pa.array(warc_ts, type=pa.timestamp("us"))
    for s in range(spec.num_slices):
        for sh in range(spec.shards):
            sel = np.flatnonzero((slice_of == s) & (shard_of == sh))
            table = pa.Table.from_arrays(
                [
                    pa.array([urls[i] for i in sel], type=pa.string()),
                    ts_arr.take(pa.array(sel)),
                    pa.array([htmls[i] for i in sel], type=pa.large_binary()),
                    pa.array([texts[i] for i in sel], type=pa.string()),
                    pa.array([langs[i] for i in sel], type=pa.string()),
                ],
                schema=PAGES_SCHEMA,
            )
            path = os.path.join(out_dir, f"pages-{s:04d}-{sh:02d}.parquet")
            pq.write_table(table, path)
            files.append(path)

    return {
        "rows": n,
        "files": files,
        "num_slices": spec.num_slices,
        "shards": spec.shards,
        "span_s": spec.span_s,
        "start_ts_us": spec.start_ts_us,
    }


def _apply_fixtures(
    spec: PagesSpec,
    rng: np.random.Generator,
    urls: list[str],
    warc_ts: np.ndarray,
    htmls: list[bytes],
    texts: list[str],
    langs: list[str | None],
) -> None:
    """Overwrite reserved rows with the FIXTURES.md cases (in place).

    Fixture rows are planted at the arrival position matching their
    event time (zero disorder), so planted future timestamps never jump
    the watermark ahead of the organic stream.
    """
    n = len(urls)
    if n < 400:
        return
    used: set[int] = set()

    def rel_to_idx(rel_s: float) -> int:
        idx = min(n - 1, int(rel_s * n / spec.span_s))
        while idx in used:
            idx = (idx + 1) % n
        used.add(idx)
        return idx

    def set_row(rel_s: float, url: str, body: str, lang: str = "en") -> int:
        i = rel_to_idx(rel_s)
        urls[i] = url
        htmls[i] = text_to_html(body, "")
        texts[i] = body
        langs[i] = lang
        warc_ts[i] = spec.start_ts_us + int(rel_s * 1e6)
        return i

    # Case 1: duplicate within dedup window — only first survives.
    # Case 2: duplicate outside window — both survive.
    for p in range(spec.fixture_pairs):
        rel = 10.0 + p * 7
        u = f"https://{_host_name(1)}/fixtures/dup-within/{p}"
        set_row(rel, u, f"dup within {p} body text")
        set_row(rel + 0.5 * spec.dedup_window_s, u, f"dup within {p} body text")
        rel2 = 13.0 + p * 7
        u2 = f"https://{_host_name(2)}/fixtures/dup-outside/{p}"
        set_row(rel2, u2, f"dup outside {p} body text")
        set_row(rel2 + 2.0 * spec.dedup_window_s, u2, f"dup outside {p} body text")

    # Case 3: threshold boundary lengths (at passes, below fails; >= semantics)
    for off, delta, tag in ((0, 0, "at"), (7, 1, "above"), (14, -1, "below")):
        body = "x" * (spec.threshold_len + delta)
        set_row(100.0 + off, f"https://{_host_name(3)}/fixtures/len-{tag}", body)

    # Case 7: session-gap sequence on a dedicated host: 3 bursts of 4 rows,
    # 10s intra-burst gap, inter-burst gap = 2 x session_gap.
    t0_rel = spec.span_s / 4
    for burst in range(3):
        for k in range(4):
            rel = t0_rel + burst * 2 * spec.session_gap_s + k * 10
            u = f"https://{SESSION_HOST}/fixtures/session/{burst}/{k}"
            set_row(rel, u, f"session burst {burst} item {k}")


def pages_files(data_dir: str, slices: "range | list[int] | None" = None) -> list[str]:
    """Sorted pages log files, optionally restricted to arrival slices."""
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(data_dir, "pages-*.parquet")))
    if slices is not None:
        wanted = {int(s) for s in slices}
        files = [
            f
            for f in files
            if int(os.path.basename(f).split("-")[1]) in wanted
        ]
    return files


def read_pages(data_dir: str, columns: list[str] | None = None,
               slices: "range | list[int] | None" = None):
    """``ray.data.read_parquet`` over the pages log only (column-pruned).

    The host_metadata table lives alongside the log; this reader always
    selects just the ``pages-*`` files so schemas never mix.
    """
    import ray.data as rd

    return rd.read_parquet(pages_files(data_dir, slices), columns=columns)


# --- host metadata (small join side; Currency/DexInfo analog) -----------


HOST_METADATA_SCHEMA = pa.schema(
    [
        pa.field("host", pa.string()),
        pa.field("category", pa.string()),
        pa.field("weight", pa.float64()),
        pa.field("updated_ts", pa.timestamp("us")),
    ]
)

CATEGORIES = ["news", "blog", "shop", "forum", "docs"]


def generate_host_metadata(out_dir: str, spec: PagesSpec = PagesSpec()) -> str:
    """Versioned per-host metadata: ~90% host coverage, 1-3 versions each.

    The missing 10% exercises unmatched-join handling (default
    ``"unknown"`` like reference ``src/consumer.rs:316-327``); multiple
    versions per host feed the as-of join (latest ``updated_ts`` <=
    ``warc_ts`` wins).
    """
    rng = np.random.default_rng(spec.seed + 1)
    os.makedirs(out_dir, exist_ok=True)
    hosts, cats, weights, ts = [], [], [], []
    span_us = spec.span_s * 1_000_000
    for h in range(spec.num_hosts):
        if rng.random() < 0.10 and h not in (0, 1, 2, 3):
            continue  # uncovered host
        versions = int(rng.integers(1, 4))
        for v in range(versions):
            hosts.append(_host_name(h))
            cats.append(CATEGORIES[int(rng.integers(0, len(CATEGORIES)))])
            weights.append(float(np.round(rng.random() * 0.999 + 0.001, 6)))
            # versions spread from before the log starts through mid-log
            ts.append(
                spec.start_ts_us
                - span_us // 2
                + (v * span_us) // max(versions, 1)
                + int(rng.integers(0, 1_000_000))
            )
    hosts.append(SESSION_HOST)
    cats.append("forum")
    weights.append(0.5)
    ts.append(spec.start_ts_us - span_us)
    table = pa.Table.from_arrays(
        [
            pa.array(hosts, type=pa.string()),
            pa.array(cats, type=pa.string()),
            pa.array(weights, type=pa.float64()),
            pa.array(ts, type=pa.timestamp("us")),
        ],
        schema=HOST_METADATA_SCHEMA,
    )
    path = os.path.join(out_dir, "host_metadata.parquet")
    pq.write_table(table, path)
    return path


def file_event_maxes(files: list[str], ts_col: str = "warc_ts"
                     ) -> list[tuple[str, int]]:
    """Per-file ``(partition_id, max event ts in us)`` read from parquet
    FOOTER statistics — the driver-side metastore scan that feeds
    per-partition watermarks (no data pass). Partition id is the
    key-shard suffix of the file name (``pages-{slice}-{shard}``), the
    stable stream identity across arrival slices."""
    import pyarrow.parquet as _pq

    out = []
    for f in files:
        name = os.path.basename(f)
        pid = name.rsplit(".", 1)[0].rsplit("-", 1)[-1]
        pf = _pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index(ts_col)
        mx = None
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                v = st.max
                if mx is None or v > mx:
                    mx = v
        if mx is not None:
            out.append((pid, int(pd.Timestamp(mx).value // 1000)))
    return out
