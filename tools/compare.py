#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate:
runs each oracle_sql.json entry in DuckDB over the sf tables and compares
with the Spark parquet output (columns sorted by name, row order as-is)."""
import sys, json, glob, math
import duckdb

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
        got = con.sql(f"SELECT * FROM '{files[0]}'").fetchall()
        gcols = [d[0] for d in con.sql(f"SELECT * FROM '{files[0]}' LIMIT 0").description]
        exp_rel = con.sql(oracle[name])
        exp = exp_rel.fetchall()
        ecols = [d[0] for d in exp_rel.description]
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fails += 1; continue
    ok = True
    if sorted(gcols) != sorted(ecols):
        print(f"{name}: SCHEMA cols {sorted(gcols)} vs {sorted(ecols)}"); ok = False
    elif len(got) != len(exp):
        print(f"{name}: ROWS {len(got)} vs {len(exp)}"); ok = False
    else:
        gi = [gcols.index(c) for c in sorted(gcols)]
        ei = [ecols.index(c) for c in sorted(ecols)]
        for rn, (g, e) in enumerate(zip(got, exp)):
            gr = [g[i] for i in gi]; er = [e[i] for i in ei]
            for c, (a, b) in zip(sorted(gcols), zip(gr, er)):
                same = (a == b)
                if isinstance(a, float) and isinstance(b, float):
                    same = (a == b) or (math.isnan(a) and math.isnan(b))
                if not same:
                    print(f"{name}: VALUE row {rn} col {c}: {a!r} vs {b!r}")
                    ok = False; break
            if not ok: break
    if ok:
        print(f"{name}: OK ({len(got)} rows)")
    else:
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} match")
sys.exit(1 if fails else 0)
