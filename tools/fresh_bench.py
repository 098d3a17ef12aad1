#!/usr/bin/env python3
"""Fresh-JVM timings for the slowest bench queries.

Usage: tools/fresh_bench.py BENCH_JSON OUT_JSON [N] [SF_DIR]

Reads the full-run bench JSON, picks the N (default 10) slowest queries
by warm median, runs each ALONE in its own sbt/JVM (`runMain graft.Bench
<q>`), and writes {"fresh_jvm_sec": {q: warm_sec}}. A fresh-JVM number
separates in-JVM pressure (heap, code-cache, block-manager residue from
200+ earlier queries) from real plan regressions: a query that is slow
in the full run but fast alone moved with the JVM, not with its code.
Run on an idle box — concurrent Spark jobs contaminate totals 40%+.
"""
import json
import re
import subprocess
import sys


def main(bench_path, out_path, n=10, sf_dir="/root/testdata/sf0.1"):
    bench = json.load(open(bench_path))
    slowest = sorted(bench.get("queries", {}).items(),
                     key=lambda kv: -kv[1])[:n]
    fresh = {}
    for q, full_sec in slowest:
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
         sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1")
