#!/usr/bin/env python3
"""Dev-only harness (mirrors the driver's t2 gate; NOT part of the library).

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir tables.
Compares STRICTLY: sorted rows, exact values (bitwise for floats), and
column dtypes — stricter than any plausible driver compare.
"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d)))
fails, rows_only = [], []
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    got = con.sql(f"SELECT * FROM read_parquet('{files[0]}')").df()
    if name not in oracle:
        rows_only.append((name, len(got))); continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {str(e)[:200]}")); continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        fails.append((name, f"columns differ: {gcols} vs {ecols}")); continue
    got, exp = got[gcols], exp[ecols]
    if list(map(str, got.dtypes)) != list(map(str, exp.dtypes)):
        fails.append((name, f"dtypes differ: {list(zip(gcols, got.dtypes, exp.dtypes))}"))
        continue
    if len(got) != len(exp):
        fails.append((name, f"row count {len(got)} vs {len(exp)}")); continue
    g = got.sort_values(gcols, kind="mergesort").reset_index(drop=True)
    e = exp.sort_values(ecols, kind="mergesort").reset_index(drop=True)
    neq = (g != e) & ~(g.isna() & e.isna())
    if neq.any().any():
        bad = neq.any(axis=1)
        i = bad.idxmax()
        fails.append((name, f"{int(bad.sum())} rows differ; first at {i}:\n"
                      f"  spark:  {g.loc[i].to_dict()}\n  oracle: {e.loc[i].to_dict()}"))
        continue
    print(f"OK    {name:24s} {len(got):>8} rows")
for name, n in rows_only:
    print(f"ROWS  {name:24s} {n:>8} rows (no oracle)")
for name, msg in fails:
    print(f"FAIL  {name}: {msg}")
print(f"\n{len(names)-len(fails)}/{len(names)} pass ({len(rows_only)} rows-only)")
sys.exit(1 if fails else 0)
