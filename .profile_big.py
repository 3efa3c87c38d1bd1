import time, shutil, sys
import ray
ncpu = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship, ensure_pages_log
from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec
from bitquery_kafka_streams_rust_ray.config import EngineConfig

spec = PagesSpec(num_rows=200000, num_slices=8, shards=8, span_s=1800, words_per_page=(60,240))
data_dir = "/tmp/bitquery_kafka_streams_rust_ray_bench_pages_200000"
ensure_pages_log(data_dir, spec)
cfg = EngineConfig(min_text_len=1, state_shards=max(8,ncpu), extract_concurrency=ncpu,
                   join_concurrency=2, files_per_epoch=4, read_batch_size=4096, batch_size=8192, read_num_blocks=2*ncpu)
out = "/tmp/prof_big_out"
shutil.rmtree(out, ignore_errors=True)
t0 = time.time()
s = run_flagship(data_dir, out, config=cfg, resume=False)
dt = time.time() - t0
rows = s["metrics"]["counters"]["rows_read"]
print(f"ncpu={ncpu} rows={rows} total={dt:.1f}s rate={rows/dt:.0f}/s")
shutil.rmtree(out, ignore_errors=True)
ray.shutdown()
