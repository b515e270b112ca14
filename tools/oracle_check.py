#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the fixture tables in <sfDir>,
then compares: row count, column names (sorted), and cell values after
sorting columns by name and rows by all columns. NOT shipped code — dev-side
verification only (mirrors what the driver does with CORRECTNESS_r{N}.json).
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize for stable sort/compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    issues = []
    if sorted(got.columns) != sorted(want.columns):
        issues.append(f"columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        return issues
    if len(got) != len(want):
        issues.append(f"row count differs: spark={len(got)} oracle={len(want)}")
    g, w = canon(got), canon(want)
    n = min(len(g), len(w))
    for c in g.columns:
        gv, wv = g[c].iloc[:n], w[c].iloc[:n]
        if pd.api.types.is_float_dtype(gv) and pd.api.types.is_float_dtype(wv):
            bad = ~((gv == wv) | (gv.isna() & wv.isna()))
        else:
            bad = ~((gv.astype(str) == wv.astype(str)) | (gv.isna() & wv.isna()))
        if bad.any():
            i = bad.idxmax()
            issues.append(f"col {c}: {int(bad.sum())} mismatches, first at row {i}: spark={gv[i]!r} oracle={wv[i]!r}")
    return issues


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"SKIP  {name}: no oracle (rows={len(got)})")
            n_skip += 1
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        issues = compare(name, got, want)
        if issues:
            print(f"FAIL  {name}:")
            for i in issues:
                print(f"      {i}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
