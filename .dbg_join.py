import time
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
import ray.data as rd
import pyarrow as pa, pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

SF="/root/testdata/sf0.1"
li = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey","l_extendedprice","l_discount"])
def rev(t):
    r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
    return t.append_column("revenue", r).select(["l_orderkey","revenue"])
li = li.map_batches(rev, batch_format="pyarrow")
orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey","o_orderpriority"])
t0=time.time()
j = li.join(orders, "inner", num_partitions=16, on=("l_orderkey",), right_on=("o_orderkey",))
out = j.groupby("o_orderpriority").aggregate(Count(alias_name="n_items"), Sum("revenue", alias_name="revenue")).to_pandas()
print(f"native join+agg: {time.time()-t0:.1f}s"); print(out.sort_values("o_orderpriority").head())
ray.shutdown()
