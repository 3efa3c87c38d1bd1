"""Pure, deterministic batch/scalar functions used inside map_batches."""
