"""Event-time column helpers: normalize to int64 microseconds."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

US = 1_000_000
NEG_INF_TS = -(1 << 62)  # "no event time observed yet" sentinel


def series_ts_us(s: pd.Series) -> pd.Series:
    """pandas Series (datetime64[any unit] or integer) -> int64 microseconds."""
    if pd.api.types.is_datetime64_any_dtype(s):
        if getattr(s.dtype, "tz", None) is not None:
            s = s.dt.tz_localize(None)
        return s.astype("datetime64[us]").astype("int64")
    return s.astype("int64")


def column_ts_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Arrow timestamp/integer column -> int64 microsecond ndarray."""
    t = col.type
    if pa.types.is_timestamp(t):
        col = pc.cast(col, pa.timestamp("us"))
        col = pc.cast(col, pa.int64())
    elif not pa.types.is_integer(t):
        raise TypeError(f"unsupported event-time type: {t}")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def us_to_timestamp_array(values: np.ndarray) -> pa.Array:
    return pa.array(np.asarray(values, dtype=np.int64), type=pa.int64()).cast(
        pa.timestamp("us")
    )
