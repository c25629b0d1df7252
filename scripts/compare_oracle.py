#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle
SQL in DuckDB over the sf parquet tables and compare (after sorting
columns by name) against the Verify-dumped parquet results.
Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        want = con.sql(sql).df()
    except Exception as e:
        fails.append(name); print(f'ORACLE-ERR  {name}: {e}'); continue
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        fails.append(name); print(f'NO-RESULT   {name}'); continue
    got = duckdb.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    w = want.reindex(sorted(want.columns), axis=1).reset_index(drop=True)
    g = got.reindex(sorted(got.columns), axis=1).reset_index(drop=True)
    if list(w.columns) != list(g.columns):
        fails.append(name)
        print(f'COLS        {name}: oracle={list(w.columns)} got={list(g.columns)}')
        continue
    if w.shape != g.shape:
        fails.append(name)
        print(f'SHAPE       {name}: oracle={w.shape} got={g.shape}')
        continue
    eq = (w.astype(str) == g.astype(str)).all().all()
    if not eq:
        fails.append(name)
        diff = (w.astype(str) != g.astype(str)).any(axis=1)
        print(f'VALUES      {name}: first diffs:')
        print('  oracle:', w[diff].head(3).to_dict('records'))
        print('  got:   ', g[diff].head(3).to_dict('records'))
    else:
        print(f'OK          {name} ({w.shape[0]} rows)')

# rows-only entries (no oracle): just require rows > 0
for d in sorted(glob.glob(f'{out}/*/')):
    name = d.rstrip('/').split('/')[-1]
    if name in oracle: continue
    n = duckdb.sql(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
    print(f'{"ROWS-OK" if n > 0 else "ROWS-EMPTY":11} {name} ({n} rows)')
    if n == 0: fails.append(name)

print(f'\n{len(fails)} failures' if fails else '\nALL MATCH')
sys.exit(1 if fails else 0)
