#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and compare (columns sorted by name, rows sorted)
against the parquet Verify dumped. Strict equality; floats exact."""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
n_ok = n_bad = 0
for name in sorted(oracle):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING  {name} (no spark result)"); n_bad += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        want = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); n_bad += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(want.columns)}")
        n_bad += 1; continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    if len(gs) != len(ws):
        print(f"ROWS     {name}: spark={len(gs)} oracle={len(ws)}"); n_bad += 1; continue
    if gs.astype(str).equals(ws.astype(str)):
        print(f"OK       {name} ({len(gs)} rows)"); n_ok += 1
    else:
        diff = (gs.astype(str) != ws.astype(str)).any(axis=1)
        print(f"VALUES   {name}: {diff.sum()} differing rows; first:")
        print(" spark:", gs[diff].head(2).to_dict("records"))
        print(" oracle:", ws[diff].head(2).to_dict("records"))
        n_bad += 1
print(f"\n{n_ok} ok, {n_bad} bad")
sys.exit(1 if n_bad else 0)
