"""Driver-sim: run every queries() entry at sf0.01 and compare
row-count + sorted-column schema + order-insensitive stringified
values against oracle_sql() in DuckDB — the same three facts the
grading driver records. Exit 0 = all match.

Usage: python tools/drive_entry.py [key ...]   (no args = all keys)
Run from OUTSIDE the repo root (e.g. /tmp) so executor closures that
accidentally pickle module references fail here, not in grading."""
import sys, math
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .appName("drive").getOrCreate())

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: "<NULL>" if v is None or (isinstance(v, float) and math.isnan(v)) else str(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)

qs = E.queries()
oracles = E.oracle_sql()
fails = []
only = sys.argv[1:] or list(qs)
for name in only:
    fn = qs[name]
    try:
        sdf = fn(spark, SF).toPandas()
    except Exception as ex:
        fails.append((name, f"spark error: {ex}"))
        print(f"FAIL {name}: spark error", flush=True)
        continue
    if name not in oracles:
        print(f"ok   {name}: rows={len(sdf)} (no oracle)", flush=True)
        continue
    odf = con.execute(oracles[name]).fetchdf()
    a, b = canon(sdf), canon(odf)
    if len(a) != len(b):
        fails.append((name, f"rows {len(a)} != {len(b)}"))
        print(f"FAIL {name}: rows {len(a)} != {len(b)}", flush=True)
    elif list(a.columns) != list(b.columns):
        fails.append((name, f"cols {list(a.columns)} != {list(b.columns)}"))
        print(f"FAIL {name}: cols", flush=True)
    elif not a.equals(b):
        neq = (a != b).any(axis=1)
        fails.append((name, f"values differ on {int(neq.sum())} rows"))
        print(f"FAIL {name}: values differ on {int(neq.sum())} rows", flush=True)
        print(a[neq].head(3).to_string())
        print(b[neq].head(3).to_string())
    else:
        print(f"ok   {name}: rows={len(a)}", flush=True)

print(f"\n{len(only)-len(fails)}/{len(only)} match")
sys.exit(1 if fails else 0)
