import ray, time
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from bitquery_kafka_streams_rust_ray.pipelines.flagship import ensure_pages_log
from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec
t0=time.time()
spec = PagesSpec(num_rows=2000000, num_slices=8, shards=8, span_s=7200, words_per_page=(60,240))
ensure_pages_log("/tmp/bitquery_kafka_streams_rust_ray_bench_pages_2000000", spec)
print(f"gen done in {time.time()-t0:.0f}s")
ray.shutdown()
