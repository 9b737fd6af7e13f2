"""Driver-style oracle sweep: run every queries() entry and compare
against its oracle_sql() via DuckDB (sorted-columns value equality).
Usage: python scripts/oracle_sweep.py [sf_dir] [query ...]
(trailing args restrict the sweep to the named queries)
"""
import sys, time
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import ray, logging, duckdb, pandas as pd, numpy as np
ray.init(address='local', num_cpus=8, include_dashboard=False, logging_level='ERROR')
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
logging.getLogger('ray.data').setLevel(logging.ERROR)
import os
os.chdir('/root/repo')
import __ray_entry__ as m

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in 'region nation customer supplier part orders lineitem events documents embeddings'.split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
qs, os_ = m.queries(), m.oracle_sql()
if len(sys.argv) > 2:
    only = set(sys.argv[2:])
    unknown = only - set(qs)
    if unknown:
        sys.exit(f'unknown queries: {sorted(unknown)}')
    qs = {k: v for k, v in qs.items() if k in only}

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith('datetime'):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)

fails = 0
for name, fn in qs.items():
    t0 = time.time()
    try:
        r = fn(sf)
        rdf = r.to_pandas() if hasattr(r, 'to_pandas') else pd.DataFrame(r)
    except Exception as e:
        print(f'{name}: ERROR {type(e).__name__}: {e}')
        fails += 1
        continue
    el = round(time.time() - t0, 1)
    if name in os_:
        odf = con.execute(os_[name]).fetchdf()
        a, b = norm(rdf), norm(odf)
        ok = a.shape == b.shape and list(a.columns) == list(b.columns)
        if ok:
            for c in a.columns:
                same = a[c].equals(b[c]) or (
                    np.issubdtype(a[c].dtype, np.number) and np.allclose(a[c], b[c], atol=1e-9)
                )
                if not same:
                    ok = False
                    break
        print(f'{name}: {"MATCH" if ok else "MISMATCH " + str(a.shape) + " vs " + str(b.shape)} ({el}s)')
        if not ok:
            fails += 1
    else:
        print(f'{name}: rows-only {len(rdf)} ({el}s)')
print('FAILS:', fails)
ray.shutdown()
