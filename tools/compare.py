#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate:
runs each oracle_sql.json entry in DuckDB over the sf tables and compares
with the Spark parquet output. Like the driver, BOTH sides are row-sorted
with pandas sort_values over the name-sorted columns — so a query whose
output the driver cannot sort (e.g. array-typed cells, unhashable in
pandas) fails HERE too instead of passing locally and dying in the round
grade."""
import sys, json, glob, math
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
    try:
        got_df = con.sql(f"SELECT * FROM '{files[0]}'").df()
        exp_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fails += 1; continue
    gcols, ecols = sorted(got_df.columns), sorted(exp_df.columns)
    if gcols != ecols:
        print(f"{name}: SCHEMA cols {gcols} vs {ecols}"); fails += 1; continue
    if len(got_df) != len(exp_df):
        print(f"{name}: ROWS {len(got_df)} vs {len(exp_df)}"); fails += 1; continue
    # the driver's comparator: columns sorted by name, rows sorted by all
    # columns — a cell type pandas cannot sort (ndarray) is a driver "err"
    try:
        got = got_df[gcols].sort_values(by=gcols).reset_index(drop=True)
        exp = exp_df[ecols].sort_values(by=ecols).reset_index(drop=True)
    except Exception as e:
        print(f"{name}: DRIVER-SORT ERROR (unhashable output column?) {e}")
        fails += 1; continue
    ok = True
    for c in gcols:
        for rn, (a, b) in enumerate(zip(got[c], exp[c])):
            same = (a == b)
            if isinstance(a, float) and isinstance(b, float):
                same = (a == b) or (math.isnan(a) and math.isnan(b))
            if not same:
                print(f"{name}: VALUE row {rn} col {c}: {a!r} vs {b!r} "
                      f"(dtype {got[c].dtype} vs {exp[c].dtype})")
                ok = False; break
        if not ok: break
    # dtype mismatch surfaces as a driver hash mismatch even when values
    # compare equal (e.g. int64 vs float64 from a HUGEINT oracle sum)
    if ok:
        for c in gcols:
            if str(got[c].dtype) != str(exp[c].dtype):
                print(f"{name}: DTYPE col {c}: {got[c].dtype} vs {exp[c].dtype}")
                ok = False
    if ok:
        print(f"{name}: OK ({len(got)} rows)")
    else:
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} match")
sys.exit(1 if fails else 0)
