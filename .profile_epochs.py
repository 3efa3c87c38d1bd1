import time, shutil, sys
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship
from bitquery_kafka_streams_rust_ray.config import EngineConfig

fpe = int(sys.argv[1])
cfg = EngineConfig(min_text_len=1, state_shards=8, extract_concurrency=8,
                   join_concurrency=2, files_per_epoch=fpe, read_batch_size=1024)
data_dir = "/tmp/bitquery_kafka_streams_rust_ray_bench_pages_50000"
out = f"/tmp/prof_out_{fpe}"
shutil.rmtree(out, ignore_errors=True)
t0 = time.time()
s = run_flagship(data_dir, out, config=cfg, resume=False)
dt = time.time() - t0
rows = s["metrics"]["counters"]["rows_read"]
print(f"files_per_epoch={fpe} epochs={len(s['epochs'])} total={dt:.1f}s rate={rows/dt:.0f}/s")
shutil.rmtree(out, ignore_errors=True)
ray.shutdown()
