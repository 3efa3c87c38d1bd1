import time, shutil, sys
import ray
ncpu = int(sys.argv[1]); shards = int(sys.argv[2])
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship, ensure_pages_log
from bitquery_kafka_streams_rust_ray.sources.pages import PagesSpec
from bitquery_kafka_streams_rust_ray.config import EngineConfig

data_dir = "/tmp/bitquery_kafka_streams_rust_ray_bench_pages_200000"
cfg = EngineConfig(min_text_len=1, state_shards=shards, files_per_epoch=4,
                   read_batch_size=4096, batch_size=8192, read_num_blocks=2*ncpu)
# warmup: spin ray workers with a trivial parallel job
import ray.data as rd
rd.range(ncpu*4, override_num_blocks=ncpu*4).map_batches(lambda b: b).materialize()
out = "/tmp/prof_warm_out"
for trial in range(2):
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    s = run_flagship(data_dir, out, config=cfg, resume=False)
    dt = time.time() - t0
    rows = s["metrics"]["counters"]["rows_read"]
    print(f"ncpu={ncpu} shards={shards} trial={trial} total={dt:.1f}s rate={rows/dt:.0f}/s")
shutil.rmtree(out, ignore_errors=True)
ray.shutdown()
