"""Multi-format table sources (S1/S2 analog beyond Parquet).

The reference consumes one wire format (protobuf over Kafka,
``src/consumer.rs:213-230``); a data-processing engine needs the same
table to be readable from whatever format it lands in. All readers
return a ``ray.data.Dataset`` with a NORMALIZED schema — event-time
columns parsed to ``timestamp[us]``, binary columns decoded from the
format's encoding — so every downstream stage is format-agnostic.

Parquet is the scale path (columnar pruning, row-group predicate
pushdown); JSONL/CSV exist for interchange and are documented as such.
"""

from __future__ import annotations

import base64

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def read_table(
    paths: str | list[str],
    fmt: str = "parquet",
    columns: list[str] | None = None,
    ts_cols: list[str] | None = None,
    binary_b64_cols: list[str] | None = None,
    **read_kwargs,
) -> ray.data.Dataset:
    """Read ``paths`` in ``fmt`` ("parquet" | "jsonl" | "csv") and
    normalize: ``ts_cols`` parsed to ``timestamp[us]``,
    ``binary_b64_cols`` base64-decoded to ``large_binary`` (JSON/CSV
    cannot carry raw bytes), ``columns`` projected after decode."""
    fmt = fmt.lower()
    if fmt == "parquet":
        ds = ray.data.read_parquet(paths, columns=columns, **read_kwargs)
        ts_cols = ts_cols or []
        binary_b64_cols = []
    elif fmt in ("jsonl", "json"):
        ds = ray.data.read_json(paths, **read_kwargs)
    elif fmt == "csv":
        ds = ray.data.read_csv(paths, **read_kwargs)
    else:
        raise ValueError(f"unsupported format: {fmt}")

    ts_cols = ts_cols or []
    binary_b64_cols = binary_b64_cols or []
    if fmt == "parquet" and not ts_cols:
        return ds

    def normalize(batch: pa.Table) -> pa.Table:
        for c in ts_cols:
            if c in batch.column_names and not pa.types.is_timestamp(
                batch.schema.field(c).type
            ):
                col = batch[c]
                # Arrow casts ISO-8601 strings and epoch ints directly
                parsed = pc.cast(col, pa.timestamp("us"))
                batch = batch.set_column(
                    batch.column_names.index(c), c, parsed
                )
        for c in binary_b64_cols:
            if c in batch.column_names:
                decoded = pa.array(
                    [base64.b64decode(v) if v is not None else None
                     for v in batch[c].to_pylist()],
                    type=pa.large_binary(),
                )
                batch = batch.set_column(
                    batch.column_names.index(c), c, decoded
                )
        if columns:
            batch = batch.select(columns)
        return batch

    return ds.map_batches(normalize, batch_format="pyarrow")


def write_jsonl_shard(table: pa.Table, path: str,
                      binary_b64_cols: list[str] | None = None) -> None:
    """Interchange writer: one JSONL file, binary columns base64'd,
    timestamps ISO-formatted. Test/fixture helper, not the scale sink."""
    import json

    binary_b64_cols = binary_b64_cols or []
    cols = table.column_names
    rows = table.to_pylist()
    with open(path, "w") as f:
        for row in rows:
            for c in binary_b64_cols:
                if row.get(c) is not None:
                    row[c] = base64.b64encode(row[c]).decode("ascii")
            for c in cols:
                v = row.get(c)
                if hasattr(v, "isoformat"):
                    row[c] = v.isoformat(timespec="microseconds")
            f.write(json.dumps(row, sort_keys=True) + "\n")
