#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare (dev tool only;
the shipped library is pure Scala — this is not part of it).

Usage: python3 tools/check.py <verify_out_dir>

For each <name>/ parquet dir under verify_out_dir, runs the matching SQL
from oracle_sql.json in DuckDB, then compares (columns sorted by name,
values compared exactly; doubles to 1e-9 relative) and prints PASS/FAIL.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

con = duckdb.connect()
fails = []
for name in sorted(oracle):
    pdir = os.path.join(out, name)
    files = glob.glob(os.path.join(pdir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        fails.append(name)
        continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        duck_df = con.execute(oracle[name]).fetchdf()
        # No-decimal-outputs rule (the q308 lesson): the DRIVER hashes a
        # canonicalized frame and diverges on decimal-typed cells even
        # when both engines' values are identical — a value-compare here
        # would pass what the driver fails. Reject DECIMAL in EITHER
        # engine's output schema so the class dies locally.
        dec_cols = []
        for col, typ, *_ in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall():
            if "DECIMAL" in typ.upper():
                dec_cols.append(f"spark:{col}:{typ}")
        for col, typ, *_ in con.execute(
                f"DESCRIBE {oracle[name]}").fetchall():
            if "DECIMAL" in typ.upper() or "HUGEINT" in typ.upper():
                dec_cols.append(f"oracle:{col}:{typ}")
        if dec_cols:
            print(f"FAIL {name}: DECIMAL/HUGEINT output column(s) — the "
                  f"driver hash diverges on decimal cells; cast to BIGINT "
                  f"or VARCHAR: {dec_cols}")
            fails.append(name)
            continue
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails.append(name)
        continue
    s = spark_df[sorted(spark_df.columns)]
    d = duck_df[sorted(duck_df.columns)]
    # Driver parity: the driver lexsorts the whole frame before hashing,
    # which raises TypeError on array/map/struct cells (unhashable
    # numpy.ndarray). Sorting here makes nested-typed outputs fail
    # locally exactly as they do in the driver (the q142/q170/q180
    # escape: ORDER BY made unsorted stringify-compares pass locally).
    # Float columns are ROUNDED for the sort key only: two engines can
    # agree to 1e-9 but differ in the last bits, and a float acting as a
    # tie-breaker would then order rows differently per engine and the
    # positional compare below would report spurious mismatches.
    def sort_key_frame(df):
        k = df.copy()
        for c in k.columns:
            if k[c].dtype.kind == "f":
                k[c] = k[c].round(6)
        return k
    try:
        s = s.loc[sort_key_frame(s).sort_values(
            list(s.columns), kind="mergesort").index].reset_index(drop=True)
        d = d.loc[sort_key_frame(d).sort_values(
            list(d.columns), kind="mergesort").index].reset_index(drop=True)
    except Exception as e:
        print(f"FAIL {name}: driver-style lexsort failed (nested output type?): {e}")
        fails.append(name)
        continue
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        fails.append(name)
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        fails.append(name)
        continue
    for c in s.columns:
        if str(s[c].dtype) != str(d[c].dtype):
            print(f"WARN {name}.{c}: dtype spark={s[c].dtype} duck={d[c].dtype}")
    bad = None
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            sv = sv.astype(float); dv = dv.astype(float)
            ok = np.isclose(sv, dv, rtol=1e-9, atol=1e-12, equal_nan=True)
            exact = np.array_equal(sv, dv) or np.array_equal(
                np.isnan(sv), np.isnan(dv)) and np.all(
                (sv == dv) | (np.isnan(sv) & np.isnan(dv)))
            if not ok.all():
                bad = (c, int((~ok).sum()), "value")
                break
            if not exact:
                # driver may hash exact bytes — warn loudly
                print(f"WARN {name}.{c}: float equal to 1e-9 but not bitwise")
        else:
            sv2 = pd.Series(sv).astype(str).to_numpy()
            dv2 = pd.Series(dv).astype(str).to_numpy()
            if not np.array_equal(sv2, dv2):
                n = int((sv2 != dv2).sum())
                bad = (c, n, f"e.g. spark={sv2[sv2!=dv2][:3]} duck={dv2[sv2!=dv2][:3]}")
                break
    if bad:
        print(f"FAIL {name}: col {bad[0]} mismatches={bad[1]} {bad[2]}")
        fails.append(name)
    else:
        print(f"PASS {name} ({len(s)} rows)")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
