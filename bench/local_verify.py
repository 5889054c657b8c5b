#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare (dev tool only —
the library itself never uses python). Usage:

  SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout q_foo,q_bar"
  python3 bench/local_verify.py /root/testdata/sf0.01 /tmp/vout [q_foo,q_bar]
"""
import duckdb, json, glob, sys
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ['documents', 'embeddings', 'events', 'lineitem', 'orders',
          'customer', 'nation', 'region', 'part', 'supplier']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracles = json.load(open(f'{out}/oracle_sql.json'))

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for d in sorted(glob.glob(f'{out}/q_*')):
    name = d.split('/')[-1]
    if only and name not in only:
        continue
    spark = pd.concat([pd.read_parquet(p) for p in glob.glob(f'{d}/*.parquet')])
    if name not in oracles:
        print(f'{name}: rows-only, {len(spark)} rows')
        continue
    oracle = con.execute(oracles[name]).df()
    s, o = norm(spark), norm(oracle)
    ok_schema = list(s.columns) == list(o.columns)
    ok_rows = len(s) == len(o)
    ok_vals = ok_schema and ok_rows and s.astype(str).equals(o.astype(str))
    status = 'OK' if (ok_schema and ok_rows and ok_vals) else 'FAIL'
    if status == 'FAIL':
        fails += 1
        print(f'{name}: FAIL schema={ok_schema} rows={len(s)}/{len(o)} vals={ok_vals}')
        if ok_schema and ok_rows:
            diff = (s.astype(str) != o.astype(str)).any(axis=1)
            print('  spark:', s[diff].head(3).to_dict('records'))
            print('  oracle:', o[diff].head(3).to_dict('records'))
        else:
            print('  spark cols:', list(s.columns), 'oracle cols:', list(o.columns))
    else:
        print(f'{name}: OK ({len(s)} rows)')
sys.exit(1 if fails else 0)
