"""Basic consumer — the ``examples/basic_consumer.rs`` analog.

The reference's simplest entry point: initialize the SDK, subscribe,
and iterate events with a processor attached (``basic_consumer.rs``:
init_with_config -> BitqueryClient -> next_event loop). Here that is:
init Ray, point the source at the pages log, and iterate Arrow batches
through the extract stage with streaming backpressure — no sink, no
state, just the consume loop.

Run from the repo root: ``python examples/basic_stream.py``
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")

from bitquery_kafka_streams_rust_ray.functions.filters import PageFilter
from bitquery_kafka_streams_rust_ray.pipelines.flagship import ensure_pages_log
from bitquery_kafka_streams_rust_ray.pipelines.streaming import ExtractEnrich
from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec, read_pages

data_dir = "/tmp/bitquery_kafka_streams_rust_ray_example_basic"
ensure_pages_log(data_dir, PagesSpec(num_rows=10000, span_s=600))

# subscribe: column-pruned source over the pages log
ds = read_pages(data_dir, columns=["url", "warc_ts", "html", "lang"])

# the consume loop: extract/enrich as a streaming map, then iterate
# batches with backpressure (nothing materializes the whole log)
extracted = ds.map_batches(
    ExtractEnrich(PageFilter(min_text_len=1), watermark_us=0),
    batch_format="pyarrow",
)

seen = errors = 0
for batch in extracted.iter_batches(batch_size=2048, batch_format="pyarrow"):
    status = batch.column("_status").to_pylist()
    seen += len(status)
    errors += sum(1 for s in status if s != 0)
    if seen <= 2048:  # print a taste of the first batch, like the
        for row in batch.slice(0, 3).to_pylist():  # reference's trace log
            print(f"  {row['url']}  lang={row['lang']} "
                  f"text_len={row['text_len']}")

print(f"\nconsumed {seen} events, {errors} non-OK "
      f"({errors / seen:.1%} parse/filter/late)")

ray.shutdown()
sys.exit(0)
