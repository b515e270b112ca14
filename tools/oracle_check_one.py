#!/usr/bin/env python3
"""Single-query oracle check with explicit DuckDB resource limits — the
sf10-scale replay protocol (round 11).

At 100x fixture scale some oracles (dd11/dd12/gr3) need tens of GB of
memory or spill; running them through one shared connection (as
oracle_check.py does) lets an earlier heavy query's state OOM a later
trivial one, and the default cwd temp directory can fill the repo's
filesystem. This runner gives each query a FRESH connection with a
memory limit and an explicit spill directory, so every query gets an
individual verdict: PASS / FAIL / resource-bound.

Usage: python3 tools/oracle_check_one.py <sfDir> <verifyOutDir> <query>
       [memLimit=48GB] [tempDir=/tmp/duckspill]
"""
import sys, json, os, hashlib, time
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NULL"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    mem = sys.argv[4] if len(sys.argv) > 4 else "48GB"
    tmp = sys.argv[5] if len(sys.argv) > 5 else "/tmp/duckspill"
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    t0 = time.time()
    try:
        res = con.execute(oracle[name])
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        dh = table_hash(cols, rows)
        tbl = pq.read_table(os.path.join(out_dir, name))
        scols = tbl.column_names
        srows = (list(zip(*[tbl.column(c).to_pylist() for c in scols]))
                 if scols else [])
        sh = table_hash(scols, srows)
        ok = dh == sh and len(rows) == len(srows)
        print(f"{'PASS' if ok else 'FAIL'} {name} rows={len(rows)}/{len(srows)} "
              f"hash={'match' if dh == sh else 'MISMATCH'} "
              f"[{time.time() - t0:.0f}s]")
        sys.exit(0 if ok else 1)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]} "
              f"[{time.time() - t0:.0f}s]")
        sys.exit(2)


if __name__ == "__main__":
    main()
