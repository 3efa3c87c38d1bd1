"""Filter semantics ported from filters.rs tests + dex_processor.rs:226-324."""

import pyarrow as pa
import pyarrow.compute as pc

from bitquery_kafka_streams_rust_ray.functions.filters import (
    FilterBuilder,
    PageFilter,
    WeightedLenFilter,
)


def batch(**cols) -> pa.Table:
    return pa.table(cols)


BASE = batch(
    url=["https://a.com/1", "https://b.com/2", "https://a.com/3", "https://c.com/4"],
    warc_ts=pa.array([100, 200, 300, 400], type=pa.timestamp("us")),
    host=["a.com", "b.com", "a.com", None],
    lang=["en", "de", None, "en"],
    text=["hello world", "x", "long enough text", None],
)


def keep_urls(f: PageFilter, t: pa.Table = BASE):
    return f.apply(t)["url"].to_pylist()


def test_empty_filter_passes_all():
    assert keep_urls(PageFilter()) == BASE["url"].to_pylist()


def test_lang_membership_and_null_reject():
    f = FilterBuilder().langs(["en"]).build()
    assert keep_urls(f) == ["https://a.com/1", "https://c.com/4"]


def test_empty_list_is_noop():
    f = FilterBuilder().langs([]).hosts([]).urls([]).build()
    assert keep_urls(f) == BASE["url"].to_pylist()


def test_ts_range_inclusive():
    f = (
        FilterBuilder()
        .ts_range(pa.scalar(200, type=pa.timestamp("us")), pa.scalar(300, type=pa.timestamp("us")))
        .build()
    )
    assert keep_urls(f) == ["https://b.com/2", "https://a.com/3"]


def test_host_membership_null_rejected():
    f = FilterBuilder().hosts(["a.com", "c.com"]).build()
    # row 4 has null host -> rejected even though its url says c.com
    assert keep_urls(f) == ["https://a.com/1", "https://a.com/3"]


def test_min_text_len_inclusive_and_null_reject():
    f = FilterBuilder().min_text_len(11).build()
    assert keep_urls(f) == ["https://a.com/1", "https://a.com/3"]
    # boundary: exactly at threshold passes (>= semantics)
    at = batch(url=["u"], warc_ts=pa.array([1], type=pa.timestamp("us")),
               host=["h"], lang=["en"], text=["x" * 11])
    assert keep_urls(f, at) == ["u"]


def test_url_membership():
    f = FilterBuilder().urls(["https://b.com/2"]).build()
    assert keep_urls(f) == ["https://b.com/2"]


def test_custom_batch_udf():
    f = FilterBuilder().custom(lambda t: pc.starts_with(t["url"], "https://a")).build()
    assert keep_urls(f) == ["https://a.com/1", "https://a.com/3"]


def test_conjunction():
    f = FilterBuilder().langs(["en"]).min_text_len(5).build()
    assert keep_urls(f) == ["https://a.com/1"]


# --- WeightedLenFilter: DexProcessor.should_process semantics -----------


WBASE = batch(
    url=["u1", "u2", "u3", "u4", "u5"],
    host=["a.com", "a.com", "b.com", "a.com", "a.com"],
    weight=[2.0, 0.0, 2.0, None, 0.5],
    text=["x" * 50, "x" * 500, "x" * 50, "x" * 500, "x" * 200],
)


def test_weighted_threshold_inclusive():
    f = WeightedLenFilter(min_weighted_len=100.0)
    kept = f.apply(WBASE)["url"].to_pylist()
    # u1: 2*50=100 == threshold -> passes; u2: zero weight -> reject;
    # u3: passes; u4: null weight -> reject; u5: 0.5*200=100 -> passes
    assert kept == ["u1", "u3", "u5"]


def test_weighted_target_hosts():
    f = WeightedLenFilter(target_hosts=["b.com"], min_weighted_len=100.0)
    assert f.apply(WBASE)["url"].to_pylist() == ["u3"]


def test_weighted_disabled_when_zero_threshold():
    f = WeightedLenFilter(min_weighted_len=0.0)
    assert f.apply(WBASE)["url"].to_pylist() == ["u1", "u2", "u3", "u4", "u5"]
