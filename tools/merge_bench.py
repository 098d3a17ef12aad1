#!/usr/bin/env python3
"""Merge graft.Bench output with oracle_bench timings into one artifact.

Usage: tools/merge_bench.py BENCH_JSON ORACLE_JSON OUT_JSON [FRESH_JSON]

Adds per-query `oracle_sec` and `spark_vs_oracle` (spark warm median /
DuckDB warm median) to the bench table, prints the queries slower than
2x the oracle sorted by ratio, and writes the merged JSON (the round's
bench/full_r<k>.json). FRESH_JSON (tools/fresh_bench.py output) embeds
`fresh_jvm_sec` so watch-list drift on untouched queries is adjudicated
by artifact: full-run slow + fresh fast = JVM pressure, not a
regression.
"""
import json
import sys


def main(bench_path, oracle_path, out_path, fresh_path=None):
    bench = json.load(open(bench_path))
    oracle = json.load(open(oracle_path))["oracle_sec"]
    if fresh_path:
        bench["fresh_jvm_sec"] = json.load(open(fresh_path))["fresh_jvm_sec"]
    # q_noop is the measured per-query session floor (planning + codegen
    # + scheduling with no table reads); a ratio is a PLAN property only
    # for the time spent above it
    floor = bench.get("queries", {}).get("q_noop", 0.0)
    floor = floor if floor and floor > 0 else 0.0
    ratios, adj = {}, {}
    for q, s in bench.get("queries", {}).items():
        o = oracle.get(q)
        if o and o > 0 and s and s > 0:
            ratios[q] = round(s / o, 3)
            adj[q] = round(max(s - floor, 0.0) / o, 3)
    bench["oracle_sec"] = oracle
    bench["floor_sec"] = floor
    bench["spark_vs_oracle"] = ratios
    bench["spark_vs_oracle_adj"] = adj
    json.dump(bench, open(out_path, "w"))
    over = sorted(((r, q) for q, r in ratios.items() if r > 2.0), reverse=True)
    n = len(ratios)
    within = n - len(over)
    print(f"{n} oracle-paired queries timed; {within} within 2x of DuckDB "
          f"(floor {floor:.3f}s)")
    if over:
        over_adj = [(r, q) for r, q in over if adj[q] > 2.0]
        collapsed = len(over) - len(over_adj)
        print(f"slower than 2x raw ({len(over)}), of which {collapsed} "
              f"collapse under the floor adjustment:")
        for r, q in over:
            mark = "" if adj[q] > 2.0 else "  [floor]"
            print(f"  {q}: spark {bench['queries'][q]:.2f}s vs "
                  f"duckdb {oracle[q]:.2f}s ({r}x raw, {adj[q]}x adj){mark}")


if __name__ == "__main__":
    if len(sys.argv) not in (4, 5):
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         sys.argv[4] if len(sys.argv) == 5 else None)
