"""Local mimic of the driver: run queries() vs oracle_sql() at a given sf."""
import os
import sys
import time

import duckdb
import pandas as pd
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2:] or None

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")

import __ray_entry__ as e

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


qs, osql = e.queries(), e.oracle_sql()
fails = []
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        res = fn(SF)
        if hasattr(res, "to_pandas") and "ray.data" in type(res).__module__:
            df = res.to_pandas()
        elif hasattr(res, "to_pandas"):
            df = res.to_pandas()
        else:
            df = pd.DataFrame(res)
    except Exception as ex:
        print(f"FAIL {name}: ray error {type(ex).__name__}: {ex}")
        fails.append(name)
        continue
    dt = time.time() - t0
    if name not in osql:
        print(f"okro {name}: rows={len(df)} cols={sorted(df.columns)} ({dt:.1f}s) [rows-only]")
        continue
    try:
        odf = con.sql(osql[name]).df()
    except Exception as ex:
        print(f"FAIL {name}: oracle SQL error {ex}")
        fails.append(name)
        continue
    a, b = normalize(df), normalize(odf)
    if len(a) == len(b) == 0 and (len(a.columns) == 0 or len(b.columns) == 0):
        # Ray Data's to_pandas() drops the schema when every block is
        # empty; an empty frame on both sides is value-agreement.
        print(f"ok   {name}: rows=0 (empty both sides) ({dt:.1f}s)")
        continue
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
        fails.append(name)
        continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
        fails.append(name)
        continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        print(f"ok   {name}: rows={len(a)} ({dt:.1f}s)")
    except AssertionError as ex:
        print(f"FAIL {name}: value mismatch: {str(ex)[:400]}")
        fails.append(name)

print("FAILS:", fails if fails else "none")
ray.shutdown()
