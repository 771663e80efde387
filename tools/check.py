#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the same
testdata parquet, and compares the way the driver does (evidence:
CORRECTNESS_r01.json): both sides go through *pandas* — spark parquet via
pyarrow, oracle via duckdb .df() — columns sorted by name, rows sorted with
pandas sort_values (which CRASHES on array/ndarray cells, exactly like the
driver), values hashed dtype-sensitively (a Decimal and an equal float do
NOT match). Green here is designed to be predictive of driver green.
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Dtype-sensitive cell normalization: include the python type so a
    decimal.Decimal never equals a float even when numerically equal."""
    if v is None or v != v:  # None / NaN / NaT
        try:
            if v is None or (isinstance(v, float) and math.isnan(v)) or pd.isna(v):
                return "\0NULL"
        except (TypeError, ValueError):
            pass
    t = type(v).__name__
    if isinstance(v, float):
        return f"float:{v!r}"
    return f"{t}:{v}"


def frame(df):
    cols = sorted(df.columns)
    df = df[cols]
    # driver-equivalent: pandas lexsort over all columns; ndarray cells throw
    df = df.sort_values(by=cols, kind="mergesort")
    return cols, [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    dirs = sorted(d for d in os.listdir(out)
                  if os.path.isdir(os.path.join(out, d)))
    n_pass = n_fail = 0
    for name in dirs:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"MISS  {name}: no parquet output")
            n_fail += 1
            continue
        try:
            got_df = pq.read_table(files).to_pandas()
            got_cols, g = frame(got_df)
        except Exception as e:
            print(f"FAIL  {name}: spark-side pandas error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"NOOR  {name}: rows={len(g)} (NO ORACLE — driver grades "
                  f"this as an error, not a pass!)")
            n_fail += 1
            continue
        try:
            exp_df = con.sql(oracle[name]).df()
            exp_cols, e = frame(exp_df)
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL  {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rowcount {len(g)} != {len(e)}")
            n_fail += 1
            continue
        if g == e:
            print(f"PASS  {name}: {len(g)} rows")
            n_pass += 1
        else:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b)
            print(f"FAIL  {name}: value diff at sorted-row {diff[0]}:\n"
                  f"      spark={diff[1]}\n      duck ={diff[2]}")
            n_fail += 1
    extra = set(oracle) - set(dirs)
    for name in sorted(extra):
        print(f"MISS  {name}: oracle declared but no output dir")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
