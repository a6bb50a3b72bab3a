#!/usr/bin/env python3
"""Warm DuckDB timing of the oracle SQLs — the per-round baseline
re-measure. Runs each oracle query N times (default 3) against the
given SF dir's parquet views and reports the per-query median and the
total, as one JSON line (same shape as graft.Bench for side-by-side
reading).

Usage: python3 tools/duckbench.py <sfdir> <oracle_sql.json> [runs]
"""
import sys, os, json, time, statistics
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, oracle_path, runs=3):
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(oracle_path))
    per = {}
    for name in sorted(oracles):
        con.execute(oracles[name]).fetchall()  # discarded cold warm-up
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            times.append(time.perf_counter() - t0)
        per[name] = round(statistics.median(times), 4)
    print(json.dumps({"metric": "duckdb_total",
                      "value": round(sum(per.values()), 3),
                      "unit": "sec", "queries": per, "sf": sfdir}))

if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__.strip())
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
