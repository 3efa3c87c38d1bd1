import time, ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR", log_to_driver=False)
from bitquery_kafka_streams_rust_ray.pipelines.queries import _t, _tbytes
from bitquery_kafka_streams_rust_ray.stages.join import hash_join, join_buckets
sf="/root/testdata/sf0.1"
b = join_buckets(_tbytes(sf, "lineitem", "orders"))
print("buckets:", b)
for trial in range(3):
    orders = _t(sf, "orders", ["o_orderkey", "o_orderdate"])
    li = _t(sf, "lineitem", ["l_orderkey", "l_extendedprice"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey","l_extendedprice"]), batch_format="pyarrow")
    t0=time.time()
    j = hash_join(li, orders, on="o_orderkey", buckets=b)
    n = j.count()
    print("join", round(time.time()-t0,2), n)
ray.shutdown()
