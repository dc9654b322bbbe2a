#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the same parquet tables and compare against the parquet
Verify wrote (values in order, columns sorted by name). Driver-side
tooling only — not part of the Scala library.

Usage: dev/compare.py [sfdir] [verify_outdir]
"""
import json, math, sys, glob, os
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_out"

con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    t = os.path.basename(p).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        return v  # exact compare; report diffs below
    return v

n_pass = n_fail = 0
for key in sorted(oracle):
    sql = oracle[key]
    spark_dir = f"{OUT}/{key}"
    try:
        dd = con.execute(sql).fetch_df()
        sp = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetch_df()
    except Exception as e:
        print(f"FAIL {key}: load error: {str(e)[:200]}")
        n_fail += 1
        continue
    dd = dd[sorted(dd.columns)]
    sp = sp[sorted(sp.columns)]
    if list(dd.columns) != list(sp.columns):
        print(f"FAIL {key}: columns oracle={list(dd.columns)} spark={list(sp.columns)}")
        n_fail += 1
        continue
    # surface dtype divergence (the driver also records a schema match)
    tdiff = [(c, str(dd[c].dtype), str(sp[c].dtype)) for c in dd.columns
             if str(dd[c].dtype) != str(sp[c].dtype)]
    if tdiff:
        print(f"TYPE {key}: {tdiff}")
    if len(dd) != len(sp):
        print(f"FAIL {key}: rows oracle={len(dd)} spark={len(sp)}")
        n_fail += 1
        continue
    bad = None
    for c in dd.columns:
        a, b = dd[c].tolist(), sp[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            xn, yn = norm(x), norm(y)
            if xn is None and yn is None:
                continue
            if isinstance(xn, float) and isinstance(yn, float):
                if math.isnan(xn) and math.isnan(yn):
                    continue
                if xn != yn:
                    bad = (c, i, x, y, abs(xn - yn))
                    break
            elif str(xn) != str(yn):
                bad = (c, i, x, y, None)
                break
        if bad:
            break
    if bad:
        c, i, x, y, d = bad
        print(f"FAIL {key}: col={c} row={i} oracle={x!r} spark={y!r} absdiff={d}")
        n_fail += 1
    else:
        print(f"PASS {key} ({len(dd)} rows)")
        n_pass += 1

no_oracle = [d for d in os.listdir(OUT)
             if os.path.isdir(f"{OUT}/{d}") and d not in oracle]
for key in sorted(no_oracle):
    try:
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{OUT}/{key}/*.parquet')").fetchone()[0]
        print(f"INFO {key}: no oracle, {n} rows")
    except Exception as e:
        print(f"INFO {key}: no oracle, unreadable: {str(e)[:120]}")

print(f"\n{n_pass} pass, {n_fail} fail, {len(no_oracle)} oracle-less")
sys.exit(1 if n_fail else 0)
