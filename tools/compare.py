#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Verify
parquet output, run the matching oracle SQL in DuckDB over the same
testdata, sort columns by name + rows, and compare values exactly."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    pq = f"{out_dir}/{name}"
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    try:
        got = con.execute(f"SELECT * FROM '{pq}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: read spark output: {e}"); fails.append(name); continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails.append(name); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
        fails.append(name); continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails.append(name); continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    same = True
    for c in g.columns:
        gc, ec = g[c], e[c]
        if str(gc.dtype) != str(ec.dtype):
            print(f"  note {name}.{c}: dtype {gc.dtype} vs {ec.dtype}")
        eq = (gc == ec) | (gc.isna() & ec.isna())
        if not eq.all():
            bad = (~eq).idxmax()
            print(f"FAIL {name}: col {c} first diff at row {bad}: {gc[bad]!r} vs {ec[bad]!r}")
            same = False
    if same:
        print(f"ok   {name} ({len(got)} rows)")
    else:
        fails.append(name)

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
