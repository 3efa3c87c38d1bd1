"""Generator determinism + fixture presence + byte-identical text oracle."""

import glob
import os

import pyarrow.parquet as pq

from bitquery_kafka_streams_rust_ray.functions.compression import decompress_safe
from bitquery_kafka_streams_rust_ray.functions.extract import html_to_text
from bitquery_kafka_streams_rust_ray.sources.pages import (
    PAGES_SCHEMA,
    PagesSpec,
    generate_pages,
    url_shard,
)


def read_all(d):
    import pyarrow as pa

    return pa.concat_tables(
        pq.read_table(p) for p in sorted(glob.glob(os.path.join(d, "pages-*.parquet")))
    )


def test_schema_and_counts(pages_dir):
    d, spec, manifest = pages_dir
    t = read_all(d)
    assert t.schema.equals(PAGES_SCHEMA)
    assert t.num_rows == spec.num_rows
    assert len(manifest["files"]) == spec.num_slices * spec.shards


def test_deterministic_regeneration(tmp_path, pages_dir):
    d, spec, _ = pages_dir
    d2 = str(tmp_path / "again")
    generate_pages(d2, spec)
    a, b = read_all(d), read_all(d2)
    assert a.equals(b)


def test_byte_identical_text_invariant(pages_dir):
    """The core per-row invariant: text == extract(decompress(html))."""
    d, _, _ = pages_dir
    t = read_all(d)
    htmls = t["html"].to_pylist()
    texts = t["text"].to_pylist()
    for h, x in zip(htmls, texts):
        assert html_to_text(decompress_safe(h)) == x


def test_fixture_urls_present(pages_dir):
    d, spec, _ = pages_dir
    urls = read_all(d)["url"].to_pylist()
    joined = "\n".join(urls)
    assert "/fixtures/dup-within/0" in joined
    assert "/fixtures/dup-outside/0" in joined
    assert "/fixtures/len-at" in joined
    assert "/fixtures/session/0/0" in joined
    # dup-within urls appear exactly twice
    assert urls.count([u for u in urls if "/fixtures/dup-within/0" in u][0]) == 2


def test_hot_host_skew(pages_dir):
    d, spec, _ = pages_dir
    urls = read_all(d)["url"].to_pylist()
    hot = sum(1 for u in urls if "host-000.example.com" in u)
    assert 0.2 * spec.num_rows < hot < 0.4 * spec.num_rows


def test_shard_partitioning(pages_dir):
    """Every url lives only in files of its crc32 shard (key co-location)."""
    d, spec, _ = pages_dir
    for path in sorted(glob.glob(os.path.join(d, "pages-*.parquet"))):
        shard = int(os.path.basename(path).split("-")[2].split(".")[0])
        for u in pq.read_table(path, columns=["url"])["url"].to_pylist():
            assert url_shard(u, spec.shards) == shard


def test_threshold_fixture_lengths(pages_dir):
    d, spec, _ = pages_dir
    t = read_all(d)
    by_url = dict(zip(t["url"].to_pylist(), t["text"].to_pylist()))
    at = next(v for k, v in by_url.items() if k.endswith("len-at"))
    above = next(v for k, v in by_url.items() if k.endswith("len-above"))
    below = next(v for k, v in by_url.items() if k.endswith("len-below"))
    assert len(at) == spec.threshold_len
    assert len(above) == spec.threshold_len + 1
    assert len(below) == spec.threshold_len - 1


def test_ensure_pages_log_spec_sensitivity(tmp_path):
    """The reuse marker keys on the FULL spec: same spec reuses the
    cached log, any changed field regenerates it (a stale log under a
    changed span previously mass-dropped rows as late)."""
    from bitquery_kafka_streams_rust_ray.pipelines.flagship import ensure_pages_log

    d = str(tmp_path / "log")
    marker = os.path.join(d, ".complete")
    ensure_pages_log(d, PagesSpec(num_rows=200, span_s=600))
    m1 = os.path.getmtime(marker)
    ensure_pages_log(d, PagesSpec(num_rows=200, span_s=600))
    assert os.path.getmtime(marker) == m1          # unchanged spec: reuse
    ensure_pages_log(d, PagesSpec(num_rows=200, span_s=1200))
    assert os.path.getmtime(marker) > m1           # changed spec: regenerate
    t = read_all(d)
    span_us = max(t["warc_ts"].to_pylist()) - min(t["warc_ts"].to_pylist())
    assert span_us.total_seconds() > 600           # data reflects the new span
