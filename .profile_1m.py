import time, shutil, sys
import ray
ncpu = int(sys.argv[1])
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
import ray.data as rd
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship, ensure_pages_log
from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec
from bitquery_kafka_streams_rust_ray.config import EngineConfig

spec = PagesSpec(num_rows=1000000, num_slices=8, shards=8, span_s=3600, words_per_page=(60,240))
data_dir = "/tmp/bitquery_kafka_streams_rust_ray_bench_pages_1000000"
t0=time.time(); ensure_pages_log(data_dir, spec); print(f"gen: {time.time()-t0:.0f}s")
cfg = EngineConfig(min_text_len=1, state_shards=8, files_per_epoch=2,
                   read_batch_size={8:16384,32:4096}[ncpu], batch_size=16384, read_num_blocks=2*ncpu)
rd.range(ncpu*4, override_num_blocks=ncpu*4).map_batches(lambda b: b).materialize()
out = "/tmp/prof_1m_out"
shutil.rmtree(out, ignore_errors=True)
t0 = time.time()
s = run_flagship(data_dir, out, config=cfg, resume=False)
dt = time.time() - t0
rows = s["metrics"]["counters"]["rows_read"]
print(f"ncpu={ncpu} rows={rows} total={dt:.1f}s rate={rows/dt:.0f}/s")
shutil.rmtree(out, ignore_errors=True)
ray.shutdown()
