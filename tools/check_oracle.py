#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (parquet per query + oracle_sql.json), runs each
oracle SQL in DuckDB against the same testdata parquet tables, and compares:
row count, column names (sorted), and a hash of the value matrix with columns
sorted by name and rows sorted by all columns. Mirrors what we know of the
driver: columns sorted by name before hashing values.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stable row order: sort by all columns
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    # normalize floats to avoid representation noise
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        # normalize timestamp flavors
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df

def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(pq.read_table(spark_dir).to_pandas())
            want = canon(con.execute(sql).fetch_df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=False, rtol=1e-6, atol=1e-9)
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e).splitlines()[-1][:200]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
