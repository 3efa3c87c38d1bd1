#!/usr/bin/env python
"""Run the driver's correctness gate locally: every ``queries()`` entry
with an ``oracle_sql()`` twin executes on Ray AND DuckDB over the same
parquet tables; compare row count, sorted column names, and an
order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
  sf_dir  defaults to /root/testdata/sf0.01 (the driver's gate scale)
  name    optional subset of query names to check
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            col = col.round(6)
        h.update(c.encode())
        h.update(col.astype(str).str.cat(sep="\x1f").encode())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(n for n in oracles if not only or n in only)
    fails = []
    for name in names:
        t0 = time.time()
        try:
            got = normalize(to_df(qs[name](sf_dir)))
            want = normalize(con.execute(oracles[name]).df())
        except Exception as e:  # noqa: BLE001 — report, keep checking
            fails.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        rows_ok = len(got) == len(want)
        cols_ok = list(got.columns) == list(want.columns)
        hash_ok = rows_ok and cols_ok and value_hash(got) == value_hash(want)
        status = "ok  " if hash_ok else "FAIL"
        if not hash_ok:
            fails.append(name)
        print(f"{status} {name}: rows {len(got)}/{len(want)} "
              f"cols={'=' if cols_ok else 'DIFF'} "
              f"hash={'=' if hash_ok else 'DIFF'} ({dt:.1f}s)")
        if not cols_ok:
            print(f"     got  {list(got.columns)}")
            print(f"     want {list(want.columns)}")
    print(f"\n{len(names) - len(fails)}/{len(names)} match at {sf_dir}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
