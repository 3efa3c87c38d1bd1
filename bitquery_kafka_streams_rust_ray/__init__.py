"""Ray-Data-native structured-streaming / data-processing engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference Kafka consumer SDK
(``zisdeadbaby/bitquery-kafka-streams-rust``) as idiomatic Ray Data
pipelines: ``ray.data.Dataset`` -> ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages, hash-partitioned groupbys for
the wide steps, and an exactly-once Parquet sink with per-epoch
manifests.

Input model (per BASELINE.json ``input_hint``): a Parquet table of
Common-Crawl-style web pages with columns
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``.

Subpackages
-----------
- ``functions``   pure, vectorizable scalar/batch functions (decompress,
                  html->text extraction, filter compilation, text stats)
- ``sources``     deterministic synthetic ``pages`` generator + readers
- ``stages``      Dataset-level operators (dedup, windows, joins,
                  near-dup, ANN, multimodal)
- ``state``       keyed state stores + watermark tracking for streaming
- ``sinks``       exactly-once two-phase-commit Parquet sink
- ``pipelines``   the micro-batch streaming driver + flagship pipelines
- ``observability`` counters / gauges / histograms with Prometheus text
                  export
"""

__version__ = "0.1.0"
