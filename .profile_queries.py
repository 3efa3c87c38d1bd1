import time, sys
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from bitquery_kafka_streams_rust_ray.pipelines import queries as q
SF = "/root/testdata/sf0.1"
names = sys.argv[1:] or ["q1_pricing","tumbling_events","sliding_events","session_events",
    "windowed_dedup_events","priority_revenue","asof_latest_order","distinct_users",
    "minhash_dedup_documents","ann_topk","text_analysis_documents"]
for name in names:
    t0=time.time()
    try:
        r = getattr(q, name)(SF)
        if hasattr(r,"to_pandas"): r.to_pandas()
        print(f"{name}: {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {e}", flush=True)
ray.shutdown()
