#!/usr/bin/env python3
"""Diff two bench/full_r<k>.json files and print per-query regressions.

Usage: tools/bench_diff.py OLD.json NEW.json [threshold]

Reads the `queries` map (median-of-3 warm seconds per query) from both
files and prints every query whose NEW/OLD ratio exceeds `threshold`
(default 1.3), plus queries present in only one file, plus the total
line. Sub-50ms queries are skipped for ratio purposes — at that scale
the number is JVM noise, not a plan.

Exit code 0 always: host-level drift makes a hard gate on wall time a
flake generator (see the verify skill's round-4 notes); the output is
for the round report, the reader decides.
"""
import json
import sys


def main(old_path, new_path, threshold=1.3):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"total: {old.get('value', 0):.1f}s -> {new.get('value', 0):.1f}s "
          f"({len(oq)} -> {len(nq)} queries)")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    rows = []
    for q in sorted(set(oq) & set(nq)):
        o, n = oq[q], nq[q]
        if min(o, n) < 0.05:
            continue
        rows.append((n / o, o, n, q))
    regressions = [r for r in rows if r[0] > threshold]
    improvements = [r for r in rows if r[0] < 1.0 / threshold]
    if not regressions:
        print(f"no query regressed beyond {threshold}x")
    else:
        print(f"regressed beyond {threshold}x ({len(regressions)}):")
        for ratio, o, n, q in sorted(regressions, reverse=True):
            print(f"  {q}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
    if improvements:
        print(f"improved beyond {threshold}x ({len(improvements)}):")
        for ratio, o, n, q in sorted(improvements):
            print(f"  {q}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.3)
