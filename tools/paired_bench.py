#!/usr/bin/env python3
"""ONE-COMMAND paired Spark/DuckDB capture — the only protocol BENCH_NOTES
headlines (round-9 verdict item: the r8 1.30x-vs-1.47x spread was box-load
noise between hand-assembled captures).

Runs, in one sitting on the same box:
  1. `sbt runMain graft.Bench` at the given sfDir (full surface; per-query
     map lands in BENCH_DETAIL.json, load averages embedded by Bench),
  2. `graft.Verify` oracle_sql.json dump if missing (needed by step 3),
  3. `tools/duck_bench.py` over the identical oracle SQL set, 3-rep min,
and writes PAIRED_BENCH.json with both totals, the paired ratio, and the
box load average before/after — everything needed to adjudicate the
capture's validity without a narrative aside.

Usage: python3 tools/paired_bench.py [sfDir] [outPath]
  sfDir   default /root/testdata/sf0.1
  outPath default PAIRED_BENCH.json
"""
import sys, json, time, os, subprocess


def load_avg():
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return []


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PAIRED_BENCH.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    la0 = load_avg()
    t0 = time.time()

    # 1. Spark side (full surface; writes BENCH_DETAIL.json in cwd)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    spark_out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=repo, env=env, capture_output=True, text=True)
    spark_lines = [l for l in spark_out.stdout.splitlines()
                   if l.startswith('{"metric"')]
    if not spark_lines:
        print("FATAL: no Bench JSON line; tail of output:", file=sys.stderr)
        print(spark_out.stdout[-2000:], file=sys.stderr)
        sys.exit(1)
    spark_full = json.loads(spark_lines[0])
    spark_summary = json.loads(spark_lines[-1])

    # 2. oracle SQL dump (reuse an existing verify dump when it still
    # matches the registry — a stale dump silently under-counts the DuckDB
    # side when queries were added since it was written, observed round 11
    # when mm8 landed: duck_n 188 vs spark_n 189)
    sql_path = "/tmp/graft_paired_oracle/oracle_sql.json"
    # Staleness = the dump is missing a swept query (superset containment,
    # not count equality: Verify always dumps the FULL registry, so a full
    # dump must stay valid for subset sweeps and vice versa — a count
    # compare forced a pointless full re-dump on every subset run).
    swept = set(spark_full.get("queries", {}))
    stale = True
    if os.path.exists(sql_path):
        try:
            with open(sql_path) as f:
                stale = not swept or not swept <= set(json.load(f))
        except (OSError, json.JSONDecodeError):
            stale = True
    if stale:
        try:
            os.remove(sql_path)
        except OSError:
            pass
        subprocess.run(
            ["sbt", "-batch",
             f"runMain graft.Verify {sf_dir} /tmp/graft_paired_oracle "
             "q1_pricing_summary"],
            cwd=repo, env=env, capture_output=True, text=True, check=False)
    if not os.path.exists(sql_path):
        print("FATAL: oracle_sql.json not produced", file=sys.stderr)
        sys.exit(1)

    # 3. DuckDB side, identical SQL set, 3-rep min
    duck_out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "duck_bench.py"),
         sf_dir, sql_path, "3"],
        capture_output=True, text=True)
    if duck_out.returncode != 0 or not duck_out.stdout.strip():
        print("FATAL: duck_bench.py failed (rc=%d); stderr tail:"
              % duck_out.returncode, file=sys.stderr)
        print(duck_out.stderr[-2000:], file=sys.stderr)
        sys.exit(1)
    try:
        duck = json.loads(duck_out.stdout.strip().splitlines()[-1])
    except json.JSONDecodeError:
        print("FATAL: duck_bench.py printed no JSON; output tail:",
              file=sys.stderr)
        print(duck_out.stdout[-2000:], file=sys.stderr)
        print(duck_out.stderr[-2000:], file=sys.stderr)
        sys.exit(1)

    la1 = load_avg()
    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=repo,
                             capture_output=True, text=True).stdout.strip()
    except OSError:
        rev = None
    ratio = (spark_summary["value"] / duck["value"]) if duck["value"] else None
    result = {
        "git_rev": rev,
        "spark_total": spark_summary["value"],
        "spark_n": spark_summary.get("n"),
        "one_shot_total": spark_summary.get("one_shot_total"),
        "duck_total": duck["value"],
        "duck_n": len(duck.get("queries", {})),
        "ratio": round(ratio, 3) if ratio else None,
        "load_avg_start": la0,
        "load_avg_end": la1,
        "wall_clock_sec": round(time.time() - t0, 1),
        "sf": sf_dir,
        "spark_queries": spark_full.get("queries", {}),
        "duck_queries": duck.get("queries", {}),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    brief = {k: v for k, v in result.items()
             if k not in ("spark_queries", "duck_queries")}
    print(json.dumps(brief, sort_keys=True))


if __name__ == "__main__":
    main()
