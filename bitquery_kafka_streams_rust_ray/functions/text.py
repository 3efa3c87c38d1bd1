"""Text analysis for large-scale training-data pipelines.

Language-ID (stopword/n-gram heuristic), quality scoring, token
counting, and document fingerprinting — each a vectorized batch function
meant for ``map_batches`` over the ``documents`` table (or the pages
stream after extraction). Stateful pieces (compiled regexes, stopword
tables) are built once per actor via :class:`TextAnalyzer`.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

# Minimal per-language stopword tables (ASCII; matches the generator's
# characteristic vocabularies plus common real-language function words).
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that for with was a it on as are".split()),
    "de": frozenset("der die und das ist nicht ein mit von zu den im für auf".split()),
    "fr": frozenset("le la et les des est une dans pour que qui sur pas au".split()),
    "es": frozenset("el la de que y en los una por con se del las un".split()),
    "ja": frozenset("no ni wa wo ga de to mo kara made desu masu".split()),
}

_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"[a-zA-Z]+")
_PUNCT_RE = re.compile(r"[.,!?;:]")
# BPE-ish subword splitter: letter runs, digit runs, or single non-space symbol
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def tokens(text: str) -> list[str]:
    """Whitespace tokens."""
    return _TOKEN_RE.findall(text)


def bpe_token_count(text: str) -> int:
    """Count of BPE-ish subword units (letter runs / digit runs / symbols)."""
    return len(_BPE_RE.findall(text))


_LANGS = sorted(STOPWORDS)
_ALL_STOP = frozenset().union(*STOPWORDS.values())
# word -> languages whose table contains it (precomputed: one dict hit
# per word instead of 5 set probes in the per-language scoring loop)
_WORD_LANGS: dict[str, tuple[str, ...]] = {
    w: tuple(lang for lang in _LANGS if w in STOPWORDS[lang])
    for w in _ALL_STOP
}


def _lang_from_words(words: list[str]) -> str:
    """argmax over per-language stopword-hit fraction; deterministic
    tie-break by language-code order via strict ``>``."""
    if not words:
        return ""
    hits = dict.fromkeys(_LANGS, 0)
    for w in words:
        for lang in _WORD_LANGS.get(w, ()):
            hits[lang] += 1
    best_lang, best_score = "", 0
    for lang in _LANGS:  # sorted order = deterministic tie-break
        if hits[lang] > best_score:
            best_lang, best_score = lang, hits[lang]
    return best_lang


def detect_lang(text: str) -> str:
    """Stopword-hit language ID; '' when nothing matches.

    Score per language = fraction of words that are that language's
    stopwords; argmax with deterministic tie-break by language code.
    (The shared denominator len(words) never changes the argmax, so the
    implementation compares raw hit counts.)
    """
    return _lang_from_words([w.lower() for w in _WORD_RE.findall(text)])


def _quality_from_parts(n: int, toks: list[str], words: list[str],
                        punct: int) -> float:
    if n == 0 or not toks:
        return 0.0
    mean_len = sum(len(t) for t in toks) / len(toks)
    stop_hits = sum(1 for w in words if w in _ALL_STOP)
    stop_ratio = stop_hits / max(1, len(words))
    length_part = min(1.0, n / 500.0)
    wordlen_part = 1.0 - min(1.0, abs(mean_len - 5.0) / 5.0)
    punct_part = 1.0 - min(1.0, punct / max(1, len(toks)))
    stop_part = min(1.0, stop_ratio * 2.5)
    return round(
        0.3 * length_part + 0.2 * wordlen_part + 0.2 * punct_part + 0.3 * stop_part,
        6,
    )


def quality_score(text: str) -> float:
    """Heuristic quality in [0, 1]: length, mean word length, punctuation
    balance, stopword presence. Deterministic, pure."""
    return _quality_from_parts(
        len(text), tokens(text),
        [w.lower() for w in _WORD_RE.findall(text)],
        len(_PUNCT_RE.findall(text)),
    )


def analyze_text(text: str) -> tuple[str, float]:
    """One-pass (lang_id, quality) — tokenizes once instead of the
    2-3 redundant scans the separate functions cost per document.
    Bit-identical to (detect_lang(text), quality_score(text))."""
    words = [w.lower() for w in _WORD_RE.findall(text)]
    return (
        _lang_from_words(words),
        _quality_from_parts(len(text), tokens(text), words,
                            len(_PUNCT_RE.findall(text))),
    )


# per-byte-position multipliers for the vectorized rolling hash
_FP_BASE = np.uint64(1000003)
_FP_WINDOW = 8
_FP_POWS = _FP_BASE ** np.arange(_FP_WINDOW - 1, -1, -1, dtype=np.uint64)


def rolling_fingerprint(text: str, window: int = _FP_WINDOW) -> int:
    """Rolling-hash document fingerprint: min over all byte windows of
    a polynomial hash (a cheap winnowing-style signature; stable across
    runs). By design, near-identical documents often share a
    fingerprint — it is a near-dup bucketing key, not an exact-content
    hash.

    Vectorized: one numpy stride view + product-sum per document
    (the per-byte Python crc loop it replaces was the slowest text op
    at fixture scale and O(len) interpreter work per doc at 100 TB)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if data.size <= window:
        return zlib.crc32(data.tobytes())
    pows = (_FP_POWS if window == _FP_WINDOW
            else _FP_BASE ** np.arange(window - 1, -1, -1, dtype=np.uint64))
    # window-many shifted 1-D multiply-adds (contiguous, no 2-D temp);
    # uint64 arithmetic wraps mod 2^64; fold to 32 bits like crc32 did
    d = data.astype(np.uint64)
    n = data.size - window + 1
    hashes = np.zeros(n, dtype=np.uint64)
    for j in range(window):
        hashes += d[j:j + n] * pows[j]
    return int(hashes.min() & np.uint64(0xFFFFFFFF))


class TextAnalyzer:
    """Actor-pool batch stage: appends lang_id / token counts / quality /
    fingerprint columns to a batch with a ``text`` column."""

    def __init__(self, text_col: str = "text", fingerprint: bool = True):
        self.text_col = text_col
        self.fingerprint = fingerprint

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = pc.fill_null(batch[self.text_col], "")
        texts = col.to_pylist()
        # token counts run on Arrow's re2 kernels (vectorized); lang-ID,
        # quality and fingerprint are per-row by nature of the heuristic
        batch = batch.append_column(
            "token_count",
            pc.cast(pc.count_substring_regex(col, r"\S+"), pa.int64()),
        )
        batch = batch.append_column(
            "bpe_count",
            pc.cast(pc.count_substring_regex(col, _BPE_RE.pattern),
                    pa.int64()),
        )
        analyzed = [analyze_text(t) for t in texts]  # one scan per doc
        batch = batch.append_column(
            "lang_id", pa.array([a[0] for a in analyzed], type=pa.string())
        )
        batch = batch.append_column(
            "quality",
            pa.array([a[1] for a in analyzed], type=pa.float64()),
        )
        if self.fingerprint:
            batch = batch.append_column(
                "fingerprint",
                pa.array(
                    [rolling_fingerprint(t) for t in texts], type=pa.int64()
                ),
            )
        return batch


def char_ngrams(text: str, n: int = 3) -> set[str]:
    """Character n-gram shingle set (lowercased, whitespace collapsed)."""
    s = " ".join(text.lower().split())
    if len(s) < n:
        return {s} if s else set()
    return {s[i:i + n] for i in range(len(s) - n + 1)}


def word_ngrams(text: str, n: int = 3) -> set[str]:
    """Word n-gram shingle set (Broder shingling — the standard for
    web-scale near-dup detection; char n-grams saturate on texts drawn
    from a small vocabulary, making every document collide)."""
    toks = text.lower().split()
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
