#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare rows/schema/values.
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

fail = 0
for name, sql in sorted(oracles.items()):
    got_dir = f"{out_dir}/{name}"
    if not os.path.isdir(got_dir):
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fail += 1; continue
    try:
        # a killed/partial Verify run can leave a dir with only _SUCCESS
        # or a truncated part file — that must FAIL this query and keep
        # checking the rest, not abort the whole gate mid-loop
        got = con.execute(f"SELECT * FROM '{got_dir}/*.parquet'").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: unreadable spark output: {e}"); fail += 1; continue
    # driver semantics: sort columns by name, compare values
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(exp.columns)}"); fail += 1; continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}"); fail += 1; continue
    # exact value compare, row order respected
    mismatch = None
    for c in exp.columns:
        ev, gv = exp[c].tolist(), got[c].tolist()
        if ev != gv:
            for i, (a, b) in enumerate(zip(ev, gv)):
                if a != b:
                    mismatch = (c, i, a, b); break
            break
    if mismatch:
        c, i, a, b = mismatch
        print(f"FAIL {name}: col {c} row {i}: oracle={a} got={b}"); fail += 1
    else:
        print(f"PASS {name}: {len(exp)} rows")

print(f"\n{len(oracles) - fail}/{len(oracles)} queries match")
sys.exit(1 if fail else 0)
