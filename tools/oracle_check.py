#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> [sf_dir]

Reads <out>/oracle_sql.json, runs each oracle in DuckDB over the sf tables,
loads the Spark parquet result, sorts columns by name on both sides, and
compares row-by-row in order. Reports exact match / float-tolerance match /
mismatch per query.
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

out = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in sorted(glob.glob(f"{sf}/*.parquet")):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    sql = oracle[name]
    res_dir = f"{out}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no Spark result dir")
        fails.append(name)
        continue
    try:
        exp = con.execute(sql).fetch_df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails.append(name)
        continue
    try:
        got = pd.read_parquet(res_dir)
    except Exception as e:
        print(f"FAIL {name}: parquet read error: {e}")
        fails.append(name)
        continue
    ec, gc = sorted(exp.columns), sorted(got.columns)
    if ec != gc:
        print(f"FAIL {name}: columns differ: oracle={ec} spark={gc}")
        fails.append(name)
        continue
    exp, got = exp[ec], got[ec]
    if len(exp) != len(got):
        print(f"FAIL {name}: rowcount oracle={len(exp)} spark={len(got)}")
        fails.append(name)
        continue
    bad = None
    approx = 0
    for c in ec:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            an = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
            bn = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
            if an and bn:
                continue
            if an != bn:
                bad = (c, i, a, b); break
            if isinstance(a, float) and isinstance(b, float):
                if a == b:
                    continue
                if abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)):
                    approx += 1; continue
                bad = (c, i, a, b); break
            else:
                try:
                    eq = a == b
                except Exception:
                    eq = str(a) == str(b)
                if hasattr(eq, "all"):
                    eq = bool(pd.Series(eq).all())
                if not eq:
                    bad = (c, i, a, b); break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col={c} row={i} oracle={a!r} spark={b!r}")
        fails.append(name)
    elif approx:
        print(f"WARN {name}: {approx} float values only tolerance-equal "
              f"(driver hash compare may fail!)")
    else:
        print(f"OK   {name} ({len(exp)} rows, {len(ec)} cols)")

declared = set(oracle)
result_dirs = {os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)}
noracle = result_dirs - declared
if noracle:
    print(f"NOTE rows-only (no oracle): {sorted(noracle)}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle-matched; fails: {fails}")
sys.exit(1 if fails else 0)
