#!/usr/bin/env python3
"""Fresh-JVM timings for the slowest bench queries.

Usage: tools/fresh_bench.py BENCH_JSON OUT_JSON [N] [SF_DIR] [PREV_JSON]

Reads the full-run bench JSON, picks the N (default 10) slowest queries
by warm median — PLUS, when PREV_JSON (the prior round's full-run bench)
is given, every round-over-round mover >= 0.5 s in either direction, so
host band vs real regression is adjudicated by artifact every round.
FRESH_QUERIES=q1,q2 in the environment overrides the pick entirely
(pinned-commit A/B of a hand-chosen set). Runs each query ALONE in its
own sbt/JVM (`runMain graft.Bench <q>`) and writes
{"fresh_jvm_sec": {q: warm_sec}}. A fresh-JVM number separates in-JVM
pressure (heap, code-cache, block-manager residue from 200+ earlier
queries) from real plan regressions: a query that is slow in the full
run but fast alone moved with the JVM, not with its code.
Run on an idle box — concurrent Spark jobs contaminate totals 40%+.
"""
import json
import os
import re
import subprocess
import sys


def main(bench_path, out_path, n=10, sf_dir="/root/testdata/sf0.1",
         prev_path=None):
    bench = json.load(open(bench_path))
    cur = bench.get("queries", {})
    picked = dict(sorted(cur.items(), key=lambda kv: -kv[1])[:n])
    if prev_path:
        prev = json.load(open(prev_path)).get("queries", {})
        for q, sec in cur.items():
            if q in prev and abs(sec - prev[q]) >= 0.5:
                picked[q] = sec
    if os.environ.get("FRESH_QUERIES"):
        picked = {q: cur.get(q, 0.0)
                  for q in os.environ["FRESH_QUERIES"].split(",") if q}
    fresh = {}
    for q, full_sec in sorted(picked.items()):
        cmd = ["sbt", "-batch", f"runMain graft.Bench {q}"]
        env = {"SPARK_GRAFT_SF_DIR": sf_dir, "SPARK_GRAFT_CPUS": "32",
               "PATH": "/usr/local/sbin:/usr/local/bin:/usr/sbin:/usr/bin:/sbin:/bin",
               "HOME": "/root"}
        out = subprocess.run(cmd, capture_output=True, text=True,
                             env=env, cwd="/root/repo").stdout
        m = re.search(r'\{"metric".*\}', out)
        if not m:
            print(f"  {q}: NO OUTPUT", file=sys.stderr)
            continue
        j = json.loads(m.group(0))
        if q not in j.get("queries", {}) or j["queries"][q] is None:
            print(f"  {q}: key missing from single-query run — skipped",
                  file=sys.stderr)
            continue
        fresh[q] = j["queries"][q]
        print(f"  {q}: full {full_sec:.2f}s fresh {fresh[q]:.2f}s")
    json.dump({"fresh_jvm_sec": fresh}, open(out_path, "w"))


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10,
         sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1",
         sys.argv[5] if len(sys.argv) > 5 else None)
