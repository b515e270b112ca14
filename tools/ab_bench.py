#!/usr/bin/env python3
"""Interleaved A/B bench adjudicator (round-17 verdict item 4).

Host drift is the recurring confounder in round-over-round bench reads:
r16's raw sweep looked +1.6 s slower than r15 until a HAND-run interleave
(prior round's code re-run under today's conditions) showed HEAD was
actually ~1.2 s FASTER at matched conditions. This tool makes that
adjudication mechanical:

  1. check out the comparison rev into a detached git worktree
     (/tmp/graft_ab_<rev>) and `sbt compile` it;
  2. run the FULL `graft.Bench` surface in both checkouts INTERLEAVED
     (H-P-P-H-H-P-... — alternation cancels slow load ramps; reps runs
     per side), same box, one sitting;
  3. write AB_BENCH.json (per-run totals, per-side medians, paired
     per-query medians, load averages) and append the one-paragraph
     comparison row to BENCH_NOTES.md.

A real commit regression shows as HEAD slower than PREV in the SAME
sitting; host drift shows as both sides moving together vs their old
stamps. Per-query medians localize a regression to the query that moved.

Usage: python3 tools/ab_bench.py <prevRev> [sfDir] [repsPerSide]
  prevRev      rev to compare against (e.g. the previous round's stamp)
  sfDir        default /root/testdata/sf0.1
  repsPerSide  default 2 (H P P H)
"""
import sys, json, os, subprocess, time, datetime, statistics


def sh(args, cwd, env=None, check=True):
    r = subprocess.run(args, cwd=cwd, env=env, capture_output=True, text=True)
    if check and r.returncode != 0:
        print(f"FATAL: {' '.join(args)} rc={r.returncode}", file=sys.stderr)
        print(r.stdout[-1500:], file=sys.stderr)
        print(r.stderr[-1500:], file=sys.stderr)
        sys.exit(1)
    return r


def load_avg():
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return []


def run_bench(checkout, sf_dir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = sh(["sbt", "-batch", "runMain graft.Bench"], cwd=checkout, env=env)
    lines = [l for l in out.stdout.splitlines() if l.startswith('{"metric"')]
    if not lines:
        print("FATAL: no Bench JSON line from %s; tail:" % checkout,
              file=sys.stderr)
        print(out.stdout[-2000:], file=sys.stderr)
        sys.exit(1)
    full = json.loads(lines[0])       # per-query map
    summary = json.loads(lines[-1])   # sweep summary
    return {"total": summary["value"], "n": summary.get("n"),
            "queries": full.get("queries", {})}


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    prev_rev = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    head_rev = sh(["git", "rev-parse", "--short", "HEAD"], cwd=repo).stdout.strip()
    prev_short = sh(["git", "rev-parse", "--short", prev_rev],
                    cwd=repo).stdout.strip()

    wt = f"/tmp/graft_ab_{prev_short}"
    if not os.path.isdir(wt):
        sh(["git", "worktree", "add", "--detach", wt, prev_rev], cwd=repo)
    # build both sides BEFORE timing anything (compile cost must not land
    # inside either side's first run)
    print(f"[ab] building prev {prev_short} in {wt} ...")
    sh(["sbt", "-batch", "compile"], cwd=wt)
    print(f"[ab] building HEAD {head_rev} ...")
    sh(["sbt", "-batch", "compile"], cwd=repo)

    la0 = load_avg()
    t0 = time.time()
    runs = []  # (side, total, n, queries)
    # H P P H H P P H ... : consecutive pairs flip order so neither side
    # systematically inherits a warmer page cache or a cooler box
    order = []
    for i in range(reps):
        order += ["head", "prev"] if i % 2 == 0 else ["prev", "head"]
    for i, side in enumerate(order):
        checkout = repo if side == "head" else wt
        print(f"[ab] run {i + 1}/{len(order)}: {side} ...")
        r = run_bench(checkout, sf_dir)
        print(f"[ab]   {side} total {r['total']} s over {r['n']} queries "
              f"(load {load_avg()})")
        runs.append({"side": side, **r, "load_avg": load_avg()})

    def side_runs(s):
        return [r for r in runs if r["side"] == s]

    med = {s: round(statistics.median(r["total"] for r in side_runs(s)), 3)
           for s in ("head", "prev")}
    ratio = round(med["head"] / med["prev"], 3) if med["prev"] else None
    # per-query medians on the COMMON query set; queries only one side has
    # (added/removed since prevRev) are reported separately, not compared
    hq = [r["queries"] for r in side_runs("head")]
    pq = [r["queries"] for r in side_runs("prev")]
    common = set(hq[0]) & set(pq[0])
    per_query = {
        q: {"head": round(statistics.median(m[q] for m in hq), 3),
            "prev": round(statistics.median(m[q] for m in pq), 3)}
        for q in sorted(common)}
    moved = {q: v for q, v in per_query.items()
             if v["prev"] > 0 and v["head"] > v["prev"] * 1.3
             and v["head"] - v["prev"] > 0.1}
    result = {
        "head_rev": head_rev, "prev_rev": prev_short, "sf": sf_dir,
        "order": order,
        "head_totals": [r["total"] for r in side_runs("head")],
        "prev_totals": [r["total"] for r in side_runs("prev")],
        "median": med, "ratio_head_over_prev": ratio,
        "n_common": len(common),
        "head_only": sorted(set(hq[0]) - common),
        "prev_only": sorted(set(pq[0]) - common),
        "regressed_queries": moved,
        "load_avg_start": la0, "load_avg_end": load_avg(),
        "wall_clock_sec": round(time.time() - t0, 1),
        "per_query_median": per_query,
    }
    with open(os.path.join(repo, "AB_BENCH.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)

    stamp = datetime.date.today().isoformat()
    row = (
        f"\n### Interleaved A/B — {stamp} (`tools/ab_bench.py`)\n\n"
        f"HEAD `{head_rev}` vs `{prev_short}` at `{sf_dir}`, order "
        f"{'-'.join('H' if s == 'head' else 'P' for s in order)}, same "
        f"sitting: HEAD runs {result['head_totals']} s, prev runs "
        f"{result['prev_totals']} s -> medians {med['head']} / {med['prev']} "
        f"= **{ratio}x** over {len(common)} common queries "
        f"(load {la0} -> {result['load_avg_end']}). "
        + (f"Regressed >1.3x and >0.1 s: {sorted(moved)}."
           if moved else "No query regressed >1.3x and >0.1 s.")
        + (f" HEAD-only queries (not compared): {result['head_only']}."
           if result["head_only"] else "")
        + " Full per-run and per-query data in AB_BENCH.json.\n")
    with open(os.path.join(repo, "BENCH_NOTES.md"), "a") as f:
        f.write(row)
    brief = {k: v for k, v in result.items() if k != "per_query_median"}
    print(json.dumps(brief, sort_keys=True))
    print(f"[ab] appended comparison row to BENCH_NOTES.md; worktree kept "
          f"at {wt} (git worktree remove {wt} to drop)")


if __name__ == "__main__":
    main()
