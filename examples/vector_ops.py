"""Embedding-corpus operations end to end: centroids, k-NN labels,
ANN retrieval and int8 quantization over the embeddings table.

Run from the repo root:

    python examples/vector_ops.py [sf_dir]

Shows the vector family the engine ships for training-data work:
per-label prototypes (label_centroids_embeddings), k-NN majority-vote
classification (knn_classify_embeddings), brute-force + IVF retrieval
(ann_topk / ann_ivf_topk) and absmax int8 compression
(quantize_embeddings). Each is a streaming map or a broadcast join —
none materializes the corpus on the driver.
"""

import os
import sys

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    from bitquery_kafka_streams_rust_ray.pipelines import queries as q

    cents = q.label_centroids_embeddings(sf)
    print(f"label centroids: {len(cents)} labels, "
          f"dim={len(cents['centroid_e6'].iloc[0].split(','))}")

    knn = q.knn_classify_embeddings(sf)
    print(f"knn-classified {len(knn)} vectors; "
          f"label histogram: {knn['pred_label'].value_counts().to_dict()}")

    topk = q.ann_topk(sf)
    print(f"ann top-10 rows: {len(topk)}")

    quant = q.quantize_embeddings(sf)
    ratio = 1 / 4  # float32 -> int8
    print(f"quantized {len(quant)} vectors at {ratio:.0%} of float32 size; "
          f"median scale={quant['scale_e6'].median() / 1e6:.6f}")

    ray.shutdown()


if __name__ == "__main__":
    main()
