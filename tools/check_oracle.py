#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate — DRIVER-FAITHFUL.

Reads the Verify output dir (parquet per query + oracle_sql.json), runs each
oracle SQL in DuckDB against the same testdata parquet tables, and compares:
row count, column names (sorted), and a REPRESENTATION-SENSITIVE rendering of
the value matrix with columns sorted by name and rows sorted by all columns.

Round-6 lesson: the old tolerant compare (check_dtype=False, rtol=1e-6) let a
DuckDB HUGEINT-vs-Spark-BIGINT split through locally while the driver's exact
value hash failed it (q_drift_ks). The primary check here now renders every
cell to a canonical string that PRESERVES the int-vs-float distinction (int64
123 -> "123", float64 123.0 -> "123.0") and requires exact equality — so a
representation split fails locally the same way it fails under the driver.
A tolerant numeric compare runs only as a DIAGNOSTIC when the strict check
fails, to label the failure "representation-only" vs "values differ".
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def render_cell(v):
    """Canonical, type-revealing string for one value.

    Python ints render bare ("123"); floats keep their float-ness ("123.0",
    full repr precision) so an engine that returns 123.0 where the other
    returns 123 MISMATCHES — that is the driver behavior we must mirror.
    """
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, pd.Timestamp):
        t = v.tz_localize(None) if v.tzinfo is not None else v
        return t.isoformat()
    if isinstance(v, np.datetime64):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(render_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{render_cell(x)}" for k, x in sorted(v.items())) + "}"
    # Decimal, str, date, everything else: str() — Decimal("1.50") keeps scale
    return str(v)


def render(df: pd.DataFrame):
    """List of row tuples of canonical cell strings."""
    cols = list(df.columns)
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(render_cell(v) for v in row))
    return cols, out


def tolerant_equal(got: pd.DataFrame, want: pd.DataFrame) -> bool:
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=False, rtol=1e-6, atol=1e-9)
        return True
    except Exception:
        return False


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
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        _, got_r = render(got)
        _, want_r = render(want)
        if got_r != want_r:
            # find the first differing cell for the report
            diff = ""
            for i, (g, w) in enumerate(zip(got_r, want_r)):
                if g != w:
                    for j, (gc, wc) in enumerate(zip(g, w)):
                        if gc != wc:
                            diff = f"row {i} col {got.columns[j]}: spark={gc!r} oracle={wc!r}"
                            break
                    break
            kind = ("REPRESENTATION-ONLY (driver hash fails, values numerically equal "
                    "— likely an uncast HUGEINT / int-vs-float split)"
                    if tolerant_equal(got, want) else "values differ")
            print(f"FAIL {name}: {kind}; first diff: {diff}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
