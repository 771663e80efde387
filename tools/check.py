#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the same
testdata parquet, and compares: column name set, row count, and exact
row-sorted values. Stricter than (or equal to) whatever hash the driver
uses, so green here should mean green there.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


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
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        got_cols, got_rows = got.columns, got.fetchall()
        if name not in oracle:
            print(f"NOOR  {name}: rows={len(got_rows)} (rows-only check; "
                  f"{'OK' if got_rows else 'EMPTY!'})")
            continue
        try:
            exp = con.sql(oracle[name])
            exp_cols, exp_rows = exp.columns, exp.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL  {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        # sort columns by name (driver behavior), then sort rows
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = sorted(tuple(norm(r[i]) for i in gi) for r in got_rows)
        e = sorted(tuple(norm(r[i]) for i in ei) for r in exp_rows)
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
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len([d for d in dirs if d not in oracle])} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
