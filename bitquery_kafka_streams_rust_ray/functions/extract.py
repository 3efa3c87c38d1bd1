"""Deterministic HTML -> text extraction (M4 analog).

The reference decodes protobuf payloads into typed events
(``src/consumer.rs:213-230``); our payload is an HTML page and the
"decode" is text extraction. Per the north rule the result must be
byte-identical per url across runs and across cluster layouts, so the
implementation is a pure function of the input bytes: compiled regexes,
no locale, no external parser.

Pipeline: strict UTF-8 decode (undecodable or empty -> ``""``), drop
``<script>``/``<style>``/comments, tags -> spaces, entity unescape,
whitespace normalization (any run of whitespace -> one space, stripped).
"""

from __future__ import annotations

import html as _htmllib
import re

# Compiled once at import; actor stages get them for free per process.
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")


def html_to_text(payload: bytes | None) -> str:
    """Extract visible text from HTML bytes; pure and byte-stable.

    Returns ``""`` for null, empty, or non-UTF-8 payloads (the
    quarantine path; analog of the reference's poison-pill skip,
    ``src/consumer.rs:152-158``).
    """
    if not payload:
        return ""
    try:
        doc = payload.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return ""
    doc = _SCRIPT_STYLE_RE.sub(" ", doc)
    doc = _COMMENT_RE.sub(" ", doc)
    doc = _TAG_RE.sub(" ", doc)
    doc = _htmllib.unescape(doc)
    # " ".join(split()) IS `\s+` -> " " + strip: str.isspace() and re \s
    # agree on every Unicode code point (verified exhaustively), and the
    # C-level split runs ~3.5x faster than the regex sub — this is the
    # hottest scalar loop in the flagship exchange
    return " ".join(doc.split())


def text_to_html(text: str, title: str = "") -> bytes:
    """Deterministic inverse-ish template used by the synthetic generator.

    ``html_to_text(text_to_html(t, title))`` equals ``f"{title} {title}
    {t}"`` normalized — the generator computes the expected text with
    :func:`html_to_text` itself so the oracle stays self-consistent.
    """
    doc = (
        "<html><head>"
        f"<title>{title}</title>"
        "<style>body { font-family: sans-serif; }</style>"
        "<script>var tracked = 1 < 2;</script>"
        "</head><body>"
        f"<h1>{title}</h1>"
        "<!-- generator fixture -->"
        f"<p>{text}</p>"
        "</body></html>"
    )
    return doc.encode("utf-8")


def netloc_of(url: str) -> str:
    """Host part of an ``http(s)://host/path`` url; '' when malformed.

    Cheap split-based parse (no urllib) so it vectorizes acceptably in
    a Python loop and behaves identically everywhere.
    """
    _, sep, rest = url.partition("://")
    if not sep:
        return ""
    return rest.split("/", 1)[0]
