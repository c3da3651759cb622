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
    diffs = []          # every non-bit-identical (col,row) pair, incl. tolerance-equal
    MAX_DIFFS = 20
    def hexbits(v):
        if isinstance(v, float) and not math.isnan(v):
            import struct
            return struct.pack(">d", v).hex()
        return "-"
    for c in ec:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            an = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
            bn = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
            if an and bn:
                continue
            if an != bn:
                bad = bad or (c, i, a, b)
                if len(diffs) < MAX_DIFFS:
                    diffs.append((c, i, a, b, "HARD"))
                break
            if isinstance(a, float) and isinstance(b, float):
                if a == b:
                    continue
                if len(diffs) < MAX_DIFFS:
                    kind = "TOL" if abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)) else "HARD"
                    diffs.append((c, i, a, b, kind))
                if abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)):
                    continue
                bad = bad or (c, i, a, b); break
            else:
                try:
                    eq = a == b
                except Exception:
                    eq = str(a) == str(b)
                if hasattr(eq, "all"):
                    eq = bool(pd.Series(eq).all())
                if not eq:
                    bad = bad or (c, i, a, b)
                    if len(diffs) < MAX_DIFFS:
                        diffs.append((c, i, a, b, "HARD"))
                    break
        if bad:
            break
    approx = sum(1 for d in diffs if d[4] == "TOL")
    if diffs:
        # Row-level mismatch artifact: first N differing tuples with the
        # raw IEEE-754 bits of both sides — float divergence between the
        # engine and a foreign DuckDB build is diagnosable from this file
        # alone (TOL = tolerance-equal but NOT bit-identical: the driver's
        # hash compare fails on these even though this script tolerates them).
        with open(f"{out}/{name}_diff.txt", "w") as f:
            f.write("kind\tcol\trow\toracle\tspark\toracle_hexbits\tspark_hexbits\n")
            for c, i, a, b, kind in diffs:
                f.write(f"{kind}\t{c}\t{i}\t{a!r}\t{b!r}\t{hexbits(a)}\t{hexbits(b)}\n")
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col={c} row={i} oracle={a!r} spark={b!r} "
              f"(first {len(diffs)} diffs -> {name}_diff.txt)")
        fails.append(name)
    elif approx:
        print(f"WARN {name}: {approx} float values only tolerance-equal "
              f"(driver hash compare may fail! diffs -> {name}_diff.txt)")
    else:
        print(f"OK   {name} ({len(exp)} rows, {len(ec)} cols)")

declared = set(oracle)
result_dirs = {os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)}
noracle = result_dirs - declared
if noracle:
    print(f"NOTE rows-only (no oracle): {sorted(noracle)}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle-matched; fails: {fails}")
sys.exit(1 if fails else 0)
