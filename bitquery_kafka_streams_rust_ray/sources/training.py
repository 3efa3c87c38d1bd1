"""Training-batch reader: the consumption end of the curation pipeline.

A trainer wants a deterministic, shuffled, *streaming* stream of
fixed-size batches — never a materialized corpus. This is Ray Data's
``iter_batches`` path with two compounding shuffle levels:

1. **Block order** — ``randomize_block_order(seed=...)`` permutes the
   block list in the plan (metadata-only, free at any scale).
2. **Local shuffle buffer** — ``iter_batches(local_shuffle_buffer_size,
   local_shuffle_seed)`` shuffles rows inside a bounded buffer as
   blocks stream through (RAM-bounded by the buffer, not the dataset).

Together they approximate a global shuffle without the all-to-all
``random_shuffle()`` exchange (which at 10^12 rows is the single most
expensive operation a training pipeline can issue; see Ray Data's own
shuffle guidance). ``seed`` and ``epoch`` fold into both levels, so

- the same (seed, epoch) replays the identical batch sequence — the
  property a resumable trainer needs to skip to a step, and
- different epochs get genuinely different orders with no extra pass.

Reference analog: the batch collector (``src/batch_processor.rs:79-142``)
emits fixed-size batches from a stream; this is that surface pointed at
a trainer instead of a processor pool, with determinism the reference
never had (its worker pool is explicitly order-free,
``src/batch_processor.rs:144-156``).
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
import ray.data as rd


def training_batches(
    ds: rd.Dataset,
    batch_size: int,
    seed: int = 0,
    epoch: int = 0,
    local_shuffle_buffer: int = 0,
    batch_format: str = "pyarrow",
) -> Iterator[pa.Table]:
    """Stream deterministic shuffled training batches from a Dataset.

    ``local_shuffle_buffer`` is in ROWS (0 disables row-level shuffling
    and keeps only the block-order permutation); size it to a few
    blocks' worth — the buffer is the only thing held in driver memory.
    """
    mixed_seed = (seed * 1_000_003 + epoch) & 0x7FFFFFFF
    ds = ds.randomize_block_order(seed=mixed_seed)
    kwargs = {}
    if local_shuffle_buffer > 0:
        kwargs = {"local_shuffle_buffer_size": local_shuffle_buffer,
                  "local_shuffle_seed": mixed_seed}
    yield from ds.iter_batches(batch_size=batch_size,
                               batch_format=batch_format, **kwargs)


def training_splits(
    ds: rd.Dataset,
    world_size: int,
    seed: int = 0,
    epoch: int = 0,
    equal: bool = True,
):
    """Multi-worker trainer ingest: one streaming iterator per rank.

    ``streaming_split`` coordinates a single pass over the dataset and
    deals blocks to ``world_size`` consumers — each rank's
    ``DataIterator`` pulls its share with backpressure, nothing
    materializes, and ``equal=True`` truncates to equal sizes so
    data-parallel ranks step in lockstep (the standard multi-GPU ingest
    contract). Block order is pre-shuffled by (seed, epoch) like
    ``training_batches``. The returned iterators must be consumed
    concurrently (one per rank), not sequentially — that is Ray's
    streaming-split contract."""
    mixed_seed = (seed * 1_000_003 + epoch) & 0x7FFFFFFF
    ds = ds.randomize_block_order(seed=mixed_seed)
    return ds.streaming_split(world_size, equal=equal)


def training_epochs(
    make_ds,
    batch_size: int,
    num_epochs: int,
    seed: int = 0,
    local_shuffle_buffer: int = 0,
) -> Iterator[tuple[int, Iterator[pa.Table]]]:
    """Multi-epoch reader: yields ``(epoch, batch_iterator)`` pairs,
    re-deriving the Dataset per epoch from ``make_ds()`` (a fresh plan
    per epoch keeps lineage bounded) with a per-epoch shuffle order."""
    for epoch in range(num_epochs):
        yield epoch, training_batches(make_ds(), batch_size, seed=seed,
                                      epoch=epoch,
                                      local_shuffle_buffer=local_shuffle_buffer)
