"""HTML -> text extraction: determinism + quarantine semantics."""

from bitquery_kafka_streams_rust_ray.functions.extract import (
    html_to_text,
    netloc_of,
    text_to_html,
)


def test_round_trip_no_title():
    body = "plain body words only"
    assert html_to_text(text_to_html(body, "")) == body


def test_round_trip_with_title():
    body = "alpha beta gamma"
    out = html_to_text(text_to_html(body, "t1 t2"))
    assert out == "t1 t2 t1 t2 alpha beta gamma"


def test_strips_script_style_comments():
    doc = (
        b"<html><body><script>var x = '<p>sneaky</p>';</script>"
        b"<style>p { color: red }</style><!-- note -->real</body></html>"
    )
    assert html_to_text(doc) == "real"


def test_entity_unescape():
    assert html_to_text(b"<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_whitespace_normalized():
    assert html_to_text(b"<p>a\n\t  b \r\n c</p>") == "a b c"


def test_empty_and_null_quarantine():
    assert html_to_text(b"") == ""
    assert html_to_text(None) == ""


def test_invalid_utf8_quarantine():
    assert html_to_text(b"\xff\xfe\x00garbage\x9c") == ""


def test_byte_stable():
    doc = text_to_html("stable words here", "title")
    assert html_to_text(doc) == html_to_text(doc)


def test_netloc():
    assert netloc_of("https://a.example.com/x/y") == "a.example.com"
    assert netloc_of("http://b.org") == "b.org"
    assert netloc_of("no-scheme") == ""
