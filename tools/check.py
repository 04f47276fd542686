#!/usr/bin/env python3
"""Dev harness replicating the driver's correctness gate locally:
read each Spark result parquet from outDir, run the matching oracle SQL
in DuckDB over the sfDir tables, compare (schema, rows, values).

Usage: tools/check.py [sfDir] [outDir]
"""
import json
import math
import struct
import sys
import glob
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    """Sort columns by name, then rows by all columns (driver-style)."""
    df = df[sorted(df.columns)]
    try:
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    except Exception:
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
    return df


def values_equal(a, b):
    """Byte-strict, like the driver's hash: -0.0 != 0.0, and no float
    tolerance.  NaN == NaN (both engines canonicalize the NaN payload)."""
    if a is b:
        return True
    if (a is None) != (b is None):
        return False
    if a is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # struct.pack distinguishes -0.0 from 0.0 and any last-ulp drift
        return struct.pack("<d", a) == struct.pack("<d", b)
    return a == b


def values_near(a, b):
    """The old lenient comparison, kept only for diagnostics."""
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) < 1e-9
    return a == b


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pq = f"{out}/{name}"
        files = glob.glob(f"{pq}/*.parquet")
        if not files:
            results[name] = "MISSING SPARK OUTPUT"
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA: got {list(g.columns)} want {list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWS: got {len(g)} want {len(e)}"
            continue
        bad = None
        exact = True
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                # pandas NaN for nulls
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn and yn:
                    continue
                if xn != yn:
                    bad = (c, i, x, y)
                    break
                if not values_equal(x, y):
                    near = " (NEAR — would have passed the old 1e-9 gate)" \
                        if values_near(x, y) else ""
                    bad = (c, i, x, y, near)
                    break
                if x != y:
                    exact = False
            if bad:
                break
        if bad:
            results[name] = (f"VALUE: col={bad[0]} row={bad[1]} "
                             f"got={bad[2]!r} want={bad[3]!r}{bad[4]}")
        else:
            # dtype comparison for hash-risk awareness
            dg = [str(t) for t in g.dtypes]
            de = [str(t) for t in e.dtypes]
            flag = "" if dg == de else f" [dtypes differ: {dg} vs {de}]"
            flag += "" if exact else " [inexact float match]"
            results[name] = "OK" + flag

    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for name, v in sorted(results.items()):
        mark = "PASS" if v.startswith("OK") else "FAIL"
        print(f"{mark} {name}: {v}")
    print(f"\n{npass}/{len(results)} pass")
    sys.exit(0 if npass == len(results) else 1)


if __name__ == "__main__":
    main()
