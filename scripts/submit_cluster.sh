#!/usr/bin/env bash
# Multi-node deployment of the flagship streaming pipeline via `ray job submit`
# (the north rule's execution mode). This sandbox has no real cluster — local
# runs use bench.py, and the N vs 4N scaling criterion is evidenced by
# `python bench.py --scaling` (two taskset-pinned parallelism levels; see
# BASELINE.md). On a real cluster:
#
#   RAY_ADDRESS=http://<head-node>:8265 ./scripts/submit_cluster.sh \
#       s3://bucket/pages-log s3://bucket/out
#
# The engine needs no code changes for multi-node: the keyed exchange routes
# by stable hash (pinned-key SipHash, cluster-layout independent), state
# shards are ordinary Ray actors the scheduler places across nodes, the
# broadcast side ships once per node via the object store, and the
# exactly-once sink writes per-epoch/per-shard files + a manifest, so any
# node can die and the run resumes from the last committed epoch.
#
# Sizing guidance for a 256-node / 100 TB run (see README + BASELINE.md):
#   - files_per_epoch: size epochs to ~1-5 min of wall time so commit
#     overhead amortizes and recovery replays little
#   - state_shards: scale with total KEY volume (dedup keys in window x
#     bytes/key), not cores; hundreds of shards across the cluster
#   - read_batch_size: keep batch x row-width ~64-256 MB per task; wide
#     html rows need smaller batches
#   - fsync_output=true for machine-crash durability

set -euo pipefail
INPUT=${1:?input pages-log dir}
OUTPUT=${2:?output dir}

# Equivalent CLI form (GRAFT_CFG_* env knobs; resume by default):
#   ray job submit --working-dir . \
#       --runtime-env-json '{"env_vars": {"GRAFT_CFG_STATE_SHARDS": "256",
#                            "GRAFT_CFG_FILES_PER_EPOCH": "8",
#                            "GRAFT_CFG_FSYNC_OUTPUT": "1"}}' \
#       -- python -m bitquery_kafka_streams_rust_ray run "$INPUT" "$OUTPUT"
# Lifecycle ops against the same output dir (no Ray session needed):
#   python -m bitquery_kafka_streams_rust_ray show "$OUTPUT"
#   python -m bitquery_kafka_streams_rust_ray savepoint "$OUTPUT" s3://bucket/sp
#   python -m bitquery_kafka_streams_rust_ray fork s3://bucket/sp s3://bucket/out2

ray job submit --working-dir . -- python -c "
from bitquery_kafka_streams_rust_ray.config import EngineConfig
from bitquery_kafka_streams_rust_ray.pipelines.flagship import run_flagship
cfg = EngineConfig(state_shards=256, files_per_epoch=8,
                   read_batch_size=1024, fsync_output=True)
summary = run_flagship('${INPUT}', '${OUTPUT}', config=cfg, resume=True)
print(summary['metrics'])
"
