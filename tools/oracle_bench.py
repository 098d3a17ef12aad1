#!/usr/bin/env python3
"""Time every DuckDB oracle query against the same parquet tables.

Usage: tools/oracle_bench.py SF_DIR ORACLE_SQL_JSON OUT_JSON [names...]

DuckDB is the same-machine columnar baseline the driver already trusts
for correctness, so its wall-clock on the identical query + identical
parquet is the honest "2x of baseline" yardstick for the Spark numbers
(single-process vectorized engine vs JVM + shuffle floor — a documented
constant factor is expected; an unexplained 10x is a finding).

Each query runs once cold then three warm passes; the reported number
is the median warm pass, mirroring graft.Bench. Output JSON:
{"sf": dir, "oracle_sec": {name: sec, ...}, "failed": [names]}.

Merge into the round bench artifact with tools/merge_bench.py.
"""
import json
import statistics
import sys
import time

import duckdb
import glob
import os


def main(sf_dir, oracle_path, out_path, names=None):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    if names:
        oracle = {k: v for k, v in oracle.items() if k in names}
    out, failed = {}, []
    for name, sql in sorted(oracle.items()):
        try:
            runs = []
            for _ in range(4):  # 1 cold + 3 warm
                t0 = time.monotonic()
                con.execute(sql).fetchall()
                runs.append(time.monotonic() - t0)
            out[name] = statistics.median(runs[1:])
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}", file=sys.stderr)
            failed.append(name)
    json.dump({"sf": sf_dir, "oracle_sec": out, "failed": failed},
              open(out_path, "w"))
    print(f"timed {len(out)} oracles, {len(failed)} failed -> {out_path}")


if __name__ == "__main__":
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         set(sys.argv[4:]) or None)
