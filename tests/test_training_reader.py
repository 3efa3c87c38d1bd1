"""Training-batch reader: determinism, coverage, and shuffle properties."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bitquery_kafka_streams_rust_ray.sources.training import (training_batches,
                                                              training_epochs)

pytestmark = pytest.mark.usefixtures("ray_session")


def make_ds(n=1000, blocks=8):
    return rd.range(n, override_num_blocks=blocks).map_batches(
        lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow")


def ids_of(batches):
    out = []
    sizes = []
    for b in batches:
        out.extend(b["doc_id"].to_pylist())
        sizes.append(b.num_rows)
    return out, sizes


def test_same_seed_epoch_replays_identical_sequence():
    a, _ = ids_of(training_batches(make_ds(), 64, seed=7, epoch=3,
                                   local_shuffle_buffer=256))
    b, _ = ids_of(training_batches(make_ds(), 64, seed=7, epoch=3,
                                   local_shuffle_buffer=256))
    assert a == b  # resumable trainers replay to a step


def test_covers_every_row_exactly_once():
    a, sizes = ids_of(training_batches(make_ds(), 64, seed=1,
                                       local_shuffle_buffer=128))
    assert sorted(a) == list(range(1000))
    assert all(s == 64 for s in sizes[:-1])  # fixed-size except the tail


def test_different_epochs_differ_but_cover():
    orders = {}
    for epoch, it in training_epochs(make_ds, 128, num_epochs=3, seed=5,
                                     local_shuffle_buffer=256):
        ids, _ = ids_of(it)
        assert sorted(ids) == list(range(1000))
        orders[epoch] = ids
    assert orders[0] != orders[1] != orders[2]


def test_block_order_only_mode_is_blockwise_permutation():
    # without a local buffer, rows inside a block stay contiguous —
    # the zero-memory mode; assert it's a permutation at block level
    ids, _ = ids_of(training_batches(make_ds(1000, 10), 100, seed=2))
    assert sorted(ids) == list(range(1000))
    blocks = [tuple(ids[i:i + 100]) for i in range(0, 1000, 100)]
    expected = {tuple(range(s, s + 100)) for s in range(0, 1000, 100)}
    assert set(blocks) == expected


def test_streaming_split_covers_all_rows_across_ranks():
    from concurrent.futures import ThreadPoolExecutor

    from bitquery_kafka_streams_rust_ray.sources.training import training_splits

    its = training_splits(make_ds(1000, 8), world_size=2, seed=3, equal=False)

    def drain(it):
        ids = []
        for b in it.iter_batches(batch_size=128, batch_format="pyarrow"):
            ids.extend(b["doc_id"].to_pylist())
        return ids

    # streaming_split iterators must be consumed concurrently
    with ThreadPoolExecutor(2) as ex:
        a, b = ex.map(drain, its)
    assert sorted(a + b) == list(range(1000))
    assert a and b  # both ranks got work
