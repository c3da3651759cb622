#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate — dtype-strict.

Usage: python3 tools/oracle_check.py <verify_out_dir> [sf_dir]

Reads <out>/oracle_sql.json, runs each oracle in DuckDB over the sf tables
and fetches the result as ARROW (not pandas — pandas silently float-equates
a DuckDB HUGEINT/decimal column to Spark's int64, the exact divergence class
that kept two queries red in rounds 8-10), loads the Spark parquet result
via pyarrow, sorts columns by name on both sides, and:

  0. FAILS on any Spark emission type outside the driver-proven envelope
     {double, int64/32/16, string, bool, timestamp, date} EVEN IF the
     oracle side matches it — the round-13 lesson: two decimal surfaces
     were bit-identical to DuckDB under this mirror and still failed the
     driver's hash. A mirror that accepts matching-but-unproven types
     does not mirror the gate that scores the round.
  1. FAILS on any arrow-type mismatch (decimal128 vs int64, double vs
     int64, int32 vs int64, ...) BEFORE comparing values — a value-equal
     but type-diverging result still fails the driver's type-aware hash.
     Timestamp timezone annotation is normalized away (Spark parquet may
     carry isAdjustedToUTC where DuckDB returns naive us-timestamps;
     the driver compares the instant).
  2. Compares row-by-row in order. Floats compare by IEEE-754 BITS
     (0.0 vs -0.0 and 1-ulp diffs are driver hash mismatches even though
     == or a tolerance would pass them); both-NaN counts as equal.

Per query prints OK / WARN (tolerance-equal floats present — driver WILL
fail these) / FAIL. All non-bit-identical cells are counted uncapped
across every column (no early break), and the first MAX_DIFFS are written
to <out>/<name>_diff.txt with raw hexbits — same artifact semantics as
ops/ResultDiff.scala.
"""
import sys, os, json, glob, math, struct

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

MAX_DIFFS = 20
REL_TOL = 1e-9

con = duckdb.connect()
for p in sorted(glob.glob(f"{sf}/*.parquet")):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")


def norm_type(t: pa.DataType) -> str:
    """Canonical type string: tz annotation dropped (instant-equal),
    large_string folded into string; everything else verbatim, so
    int32 vs int64 or decimal128 vs int64 is a mismatch."""
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    return str(t)


def hexbits(v):
    if isinstance(v, float) and not math.isnan(v):
        return struct.pack(">d", v).hex()
    return "-"


def cells_equal(a, b):
    """(bit_equal, tolerance_equal). Non-floats: bit == tolerance.

    NULL and NaN are DISTINCT: the driver's type-aware hash separates an
    arrow null from a NaN payload, so None-vs-NaN is a HARD diff here too
    (equating them recreated the silent local-pass/driver-fail class this
    script exists to eliminate). Both-None and both-NaN are each equal.
    Lists recurse elementwise so floats inside e.g. list<double> embedding
    columns get the same IEEE-bit comparison as scalar columns (plain
    a == b would pass -0.0 vs 0.0 and fail identical NaN-bearing lists).
    """
    if a is None or b is None:
        eq = a is None and b is None
        return eq, eq
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            eq = math.isnan(a) and math.isnan(b)
            return eq, eq
        bits = struct.pack(">d", a) == struct.pack(">d", b)
        tol = bits or abs(a - b) <= REL_TOL * max(1.0, abs(a), abs(b))
        return bits, tol
    if isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            return False, False
        bits, tol = True, True
        for x, y in zip(a, b):
            eb, et = cells_equal(x, y)
            bits, tol = bits and eb, tol and et
            if not tol:
                break
        return bits, tol
    try:
        eq = a == b
    except Exception:
        eq = str(a) == str(b)
    eq = bool(eq)
    return eq, eq


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
        exp = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails.append(name)
        continue
    try:
        got = pq.read_table(res_dir)
    except Exception as e:
        print(f"FAIL {name}: parquet read error: {e}")
        fails.append(name)
        continue
    ec, gc = sorted(exp.column_names), sorted(got.column_names)
    if ec != gc:
        print(f"FAIL {name}: columns differ: oracle={ec} spark={gc}")
        fails.append(name)
        continue
    # EMISSION ENVELOPE gate (round 14): the driver's hash has only ever
    # proven {double, int64/32/16, string, bool, timestamp, date32}
    # emissions. Round 13's DECIMAL(38,6) surfaces were bit-identical to
    # DuckDB under this mirror at three scales and STILL failed the
    # driver — so a mirror that accepts matching-but-unproven types does
    # not mirror the gate that scores the round. Mirrors
    # EmissionGuardSpec on the Spark side.
    PROVEN = {"double", "int64", "int32", "int16", "string", "bool",
              "date32[day]"}
    env = [
        (c, norm_type(got.schema.field(c).type)) for c in gc
        if norm_type(got.schema.field(c).type) not in PROVEN
        and not norm_type(got.schema.field(c).type).startswith("timestamp[")
    ]
    if env:
        det = "; ".join(f"{c}: {t}" for c, t in env)
        print(f"FAIL {name}: emission type outside the driver-proven envelope — {det}")
        fails.append(name)
        continue
    # dtype gate BEFORE values: a type-diverging column fails the driver's
    # type-aware hash even when every value compares equal
    tmis = [
        (c, norm_type(exp.schema.field(c).type), norm_type(got.schema.field(c).type))
        for c in ec
        if norm_type(exp.schema.field(c).type) != norm_type(got.schema.field(c).type)
    ]
    if tmis:
        det = "; ".join(f"{c}: oracle={e} spark={g}" for c, e, g in tmis)
        print(f"FAIL {name}: arrow dtype mismatch — {det}")
        fails.append(name)
        continue
    if exp.num_rows != got.num_rows:
        print(f"FAIL {name}: rowcount oracle={exp.num_rows} spark={got.num_rows}")
        fails.append(name)
        continue
    ev = {c: exp.column(c).to_pylist() for c in ec}
    gv = {c: got.column(c).to_pylist() for c in ec}
    n_hard = 0       # uncapped, across ALL columns and rows
    n_tol = 0        # uncapped tolerance-equal-but-not-bit-identical count
    diffs = []       # first MAX_DIFFS non-bit-identical cells, any kind
    first_hard = None
    for c in ec:
        ea, ga = ev[c], gv[c]
        for i in range(len(ea)):
            a, b = ea[i], ga[i]
            bits, tol = cells_equal(a, b)
            if bits:
                continue
            kind = "TOL" if tol else "HARD"
            if tol:
                n_tol += 1
            else:
                n_hard += 1
                if first_hard is None:
                    first_hard = (c, i, a, b)
            if len(diffs) < MAX_DIFFS:
                diffs.append((c, i, a, b, kind))
    if diffs:
        # Row-level mismatch artifact: raw IEEE-754 bits of both sides —
        # float divergence against a foreign DuckDB build is diagnosable
        # from this file alone. TOL = tolerance-equal but NOT bit-identical:
        # the driver's hash compare fails on these too.
        with open(f"{out}/{name}_diff.txt", "w") as f:
            f.write("kind\tcol\trow\toracle\tspark\toracle_hexbits\tspark_hexbits\n")
            for c, i, a, b, kind in diffs:
                f.write(f"{kind}\t{c}\t{i}\t{a!r}\t{b!r}\t{hexbits(a)}\t{hexbits(b)}\n")
    if first_hard:
        c, i, a, b = first_hard
        print(f"FAIL {name}: col={c} row={i} oracle={a!r} spark={b!r} "
              f"({n_hard} hard / {n_tol} tol diffs; first {len(diffs)} -> {name}_diff.txt)")
        fails.append(name)
    elif n_tol:
        print(f"WARN {name}: {n_tol} float values only tolerance-equal "
              f"(driver hash compare WILL fail! diffs -> {name}_diff.txt)")
        fails.append(name)
    else:
        print(f"OK   {name} ({exp.num_rows} rows, {len(ec)} cols)")

declared = set(oracle)
result_dirs = {os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)}
noracle = result_dirs - declared
if noracle:
    print(f"NOTE rows-only (no oracle): {sorted(noracle)}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle-matched; fails: {fails}")
sys.exit(1 if fails else 0)
