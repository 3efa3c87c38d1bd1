"""Driver-style correctness gate: every queries() entry vs its oracle_sql at sf0.01."""
import hashlib, sys
import duckdb, pandas as pd, numpy as np
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
import __ray_entry__ as e

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(df):
    df = pd.DataFrame(df)
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

qs, osql = e.queries(), e.oracle_sql()
if len(sys.argv) > 1:  # .gate.py N -> first N entries; .gate.py name1 name2 ... -> those
    if sys.argv[1].isdigit():
        qs = dict(list(qs.items())[: int(sys.argv[1])])
    else:
        qs = {k: qs[k] for k in sys.argv[1:]}
fails, rows_only = [], []
for name, fn in qs.items():
    try:
        got = fn(SF)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        got = pd.DataFrame(got)
        if name in osql:
            want = con.execute(osql[name]).df()
            g, w = norm(got), norm(want)
            ok = list(g.columns) == list(w.columns) and len(g) == len(w)
            if ok:
                gh = hashlib.sha256(pd.util.hash_pandas_object(g, index=False).values.tobytes()).hexdigest()
                wh = hashlib.sha256(pd.util.hash_pandas_object(w, index=False).values.tobytes()).hexdigest()
                ok = gh == wh
            print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(g)} rows)")
            if not ok:
                fails.append(name)
                print("  got cols:", list(g.columns), "want cols:", list(w.columns), "rows", len(g), len(w))
        else:
            print(f"{name}: rows-only ({len(got)} rows)")
            rows_only.append(name)
            assert len(got) >= 0
    except Exception as ex:
        print(f"{name}: ERROR {type(ex).__name__}: {ex}")
        fails.append(name)
print("FAILS:", fails)
ray.shutdown()
sys.exit(1 if fails else 0)
