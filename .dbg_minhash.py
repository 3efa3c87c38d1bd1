import time
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
import ray.data as rd
from bitquery_kafka_streams_rust_ray.stages.neardup import (
    MinHashStage, _bucketed_pairs, _shard_bucket_pairs, minhash_candidates)

t0=time.time()
ds = rd.read_parquet("/root/testdata/sf0.1/documents.parquet", columns=["doc_id","text"])
sig = ds.map_batches(
    MinHashStage,
    fn_constructor_kwargs={"text_col":"text","id_col":"doc_id","num_perm":64,
                           "bands":16,"ngram":3,"seed":7},
    batch_format="pyarrow", concurrency=(1,4),
).materialize()
print(f"signatures: {time.time()-t0:.1f}s rows={sig.count()}", flush=True)
t0=time.time()
pairs = _bucketed_pairs(sig, _shard_bucket_pairs)
print(f"pairs: {time.time()-t0:.1f}s n={len(pairs)}", flush=True)
ray.shutdown()
