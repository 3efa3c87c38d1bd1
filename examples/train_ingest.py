"""Training-data ingest, end to end — the LLM-pipeline composition this
engine exists for, in one runnable script:

    curate (quality filter + decontamination + exact dedup)
    -> chunk (overlapping token windows)
    -> pack  (token-budget sequence assembly)
    -> deterministic shuffled training batches (iter_batches reader)

Every stage is a streaming Dataset transform; nothing materializes
except the final output-sized manifests. The reader replays the exact
same batch sequence for the same (seed, epoch) — run the script twice
and the printed digest is identical.

Run from the repo root: ``python examples/train_ingest.py``
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")

import ray.data as rd

from bitquery_kafka_streams_rust_ray.pipelines import queries as q
from bitquery_kafka_streams_rust_ray.sources.training import training_batches

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")

# 1) curate: repetition filter + benchmark decontamination + exact dedup
curated = q.curate_documents(SF)
print(f"curated corpus: {len(curated)} docs survive")

# 2) chunk the surviving docs into overlapping training windows
#    (chunking is per-doc, so filtering the chunk manifest by curated
#    doc_ids IS the chunk set of the curated corpus)
chunks = q.chunk_documents(SF)
chunks = chunks[chunks["doc_id"].isin(set(curated["doc_id"]))]
print(f"chunks: {len(chunks)} windows (chunk=32 words, stride=24)")

# 3) pack the CURATED CHUNKS into token-budget sequences — the same
#    deterministic next-fit rule as queries.pack_documents, applied to
#    this pipeline's actual upstream output (partition key is a pure
#    data function, so bins are layout-independent)
BUDGET = 96
manifest = chunks.sort_values(["doc_id", "chunk_idx"])
bins, fill, bin_id = [], 0, 0
for n in manifest["n_words"]:
    if fill and fill + n > BUDGET:
        bin_id += 1
        fill = 0
    bins.append(bin_id)
    fill += n
manifest = manifest.assign(bin=bins)
print(f"packed: {manifest['bin'].nunique()} training sequences "
      f"(budget {BUDGET} words)")

# 4) stream deterministic shuffled batches to the "trainer"
ds = rd.from_pandas(manifest[["doc_id", "chunk_idx", "bin", "n_words"]]
                    ).repartition(8)
digest = hashlib.sha256()
n_rows = 0
for batch in training_batches(ds, batch_size=256, seed=42, epoch=0,
                              local_shuffle_buffer=1024):
    n_rows += batch.num_rows
    digest.update(str(batch["doc_id"].to_pylist()).encode())
print(f"trainer consumed {n_rows} rows; "
      f"epoch-0 order digest {digest.hexdigest()[:16]} "
      "(stable across runs for seed=42)")

ray.shutdown()
