#!/usr/bin/env python3
"""Per-query ISOLATED DuckDB timing with a kill budget — the sf10
standing-tier methodology (BASELINE.md round-12): each query runs in
its own subprocess (fresh buffer pool, no cross-query interference) and
is killed at --budget seconds (recorded as DNF).

Usage: tools/bench_duckdb_iso.py <sfDir> <oracle_sql.json> <q1,q2,...> [budget_s]
"""
import json
import subprocess
import sys

WORKER = r'''
import json, os, sys, time
import duckdb
sf, oracle_path, name = sys.argv[1], sys.argv[2], sys.argv[3]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
with open(oracle_path) as f:
    sql = json.load(f)[name]
con = duckdb.connect()
con.execute("SET enable_progress_bar=false")
for t in TABLES:
    path = f"{sf}/{t}.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    elif not os.path.exists(path):
        continue
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
con.execute(sql).fetchall()  # warm
t0 = time.time()
con.execute(sql).fetchall()
print(round(time.time() - t0, 3))
'''


def main():
    sf, oracle_path, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    budget = float(sys.argv[4]) if len(sys.argv) > 4 else 150.0
    results, total, dnf = {}, 0.0, []
    for name in names:
        try:
            out = subprocess.run(
                [sys.executable, "-c", WORKER, sf, oracle_path, name],
                capture_output=True, text=True, timeout=budget)
            if out.returncode != 0:
                results[name] = None
                dnf.append(name + ":err")
                continue
            # last stdout line that parses as a float (progress-bar
            # remnants are filtered out defensively)
            dt = None
            for ln in reversed(out.stdout.strip().splitlines()):
                try:
                    dt = float(ln.strip())
                    break
                except ValueError:
                    continue
            if dt is None:
                results[name] = None
                dnf.append(name + ":parse")
                continue
            results[name] = dt
            total += dt
        except subprocess.TimeoutExpired:
            results[name] = None
            dnf.append(name)
        print(f"{name}: {results[name]}", file=sys.stderr)
    # value sums only completed queries; value_clamped adds the full
    # budget per DNF so a consumer reading one number can never mistake
    # a timed-out baseline for a fast one (ADVICE r12).
    print(json.dumps({"metric": "duckdb_iso_total", "value": round(total, 3),
                      "value_clamped": round(total + budget * len(dnf), 3),
                      "dnf_count": len(dnf),
                      "unit": "sec", "queries": results, "dnf": dnf,
                      "budget_s": budget, "sf": sf}))


if __name__ == "__main__":
    main()
