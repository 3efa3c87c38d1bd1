"""Fluent filter + custom predicate — the ``dex_trading_bot`` /
``FilterBuilder`` analog (reference ``src/filters.rs:137-204``).

Builds a conjunctive filter with the same clause surface (type/key set,
time range, min size, custom closure), compiles it to one vectorized
Arrow mask, and streams matching pages.

Run from the repo root: ``python examples/filtered_stream.py``
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.compute as pc
import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")

import pandas as pd

from bitquery_kafka_streams_rust_ray.functions.filters import FilterBuilder
from bitquery_kafka_streams_rust_ray.pipelines.flagship import ensure_pages_log
from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec, read_pages

data_dir = "/tmp/bitquery_kafka_streams_rust_ray_example_filter"
ensure_pages_log(data_dir, PagesSpec(num_rows=20000, span_s=1200))

page_filter = (
    FilterBuilder()
    .langs(["en", "de"])                       # event_types analog
    .ts_range(pd.Timestamp("2025-01-01 00:02:00"),
              pd.Timestamp("2025-01-01 00:15:00"))  # slot_range analog
    .min_text_len(100)                          # min_amount analog
    .custom(lambda t: pc.match_substring(t["url"], "example"))
    .build()
)

ds = read_pages(data_dir, columns=["url", "warc_ts", "text", "lang"])
matched = ds.map_batches(
    lambda t: t.filter(page_filter.mask(t)), batch_format="pyarrow"
)
out = matched.to_pandas()
print(f"matched {len(out)} pages; first few:")
print(out.head(5)[["url", "warc_ts", "lang"]].to_string(index=False))

ray.shutdown()
sys.exit(0)
