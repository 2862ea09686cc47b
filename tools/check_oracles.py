#!/usr/bin/env python3
"""Driver-style correctness check: compare every SparkEntry query dump
against its DuckDB oracle (sorted columns, value-level compare).
Usage: check_oracles.py <sfdir> <verify_out_dir>
"""
import sys, json, duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['customer','nation','supplier','part','orders','lineitem',
          'events','documents','embeddings','region']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))

ok, bad, nosql = 0, [], 0
for q in sorted(oracle):
    sql = oracle[q]
    try:
        exp = con.execute(sql).df()
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{outdir}/{q}/*.parquet')").df()
        cols = sorted(exp.columns)
        if sorted(got.columns) != cols:
            bad.append((q, f"schema {sorted(got.columns)} != {cols}")); continue
        e = exp[cols].sort_values(cols).reset_index(drop=True)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        if len(e) != len(g):
            bad.append((q, f"rows {len(g)} != {len(e)}")); continue
        try:
            g = g.astype(e.dtypes.to_dict())
        except Exception:
            pass
        if e.equals(g):
            ok += 1
        else:
            diff = (e != g) & ~(e.isna() & g.isna())
            ncell = int(diff.values.sum())
            bad.append((q, f"{ncell} differing cells of {e.size}"))
    except Exception as ex:
        bad.append((q, f"error: {ex}"))

print(f"MATCH {ok}/{len(oracle)}")
for q, why in bad:
    print(f"MISMATCH {q}: {why}")
sys.exit(1 if bad else 0)
