#!/usr/bin/env python3
"""Time the DuckDB oracle SQL set — the side of the paired Spark/DuckDB
bench comparison recorded in BENCH_NOTES.md.

Usage: python3 tools/duck_bench.py <sfDir> <oracle_sql.json> [reps]

Registers the fixture parquet tables by bare name (like the driver's
oracle), then runs every oracle SQL `reps` times (default 3) and reports
the per-query minimum and the total, as one JSON line.
"""
import sys, json, time, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, sql_path = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    oracle = json.load(open(sql_path))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written fixtures (MakeScale ~sf1) are DIRECTORIES of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    best = {}
    for _ in range(reps):
        for name in sorted(oracle):
            t0 = time.time()
            try:
                con.execute(oracle[name]).fetchall()
                dt = time.time() - t0
            except Exception as e:
                print(f"FAIL {name}: {e}", file=sys.stderr)
                dt = -1.0
            if dt >= 0:
                best[name] = min(best.get(name, 1e9), dt)
    total = sum(best.values())
    qs = {k: round(v, 3) for k, v in sorted(best.items())}
    print(json.dumps({"metric": "duck_total", "value": round(total, 3),
                      "unit": "sec", "queries": qs, "sf": sf_dir}))

if __name__ == "__main__":
    main()
