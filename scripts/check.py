#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir>
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Registers each <sfDir>/*.parquet as a DuckDB view, runs every oracle in
<outDir>/oracle_sql.json, and compares against the Spark parquet dump:
row count, schema (column names), and exact cell values after sorting
columns by name and rows by all columns.
"""
import sys, json, glob, os
import duckdb

def canon(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(con, f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            want = canon(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        if not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad_cols = [c for c in got.columns if neq[c].any()]
            print(f"FAIL {name}: values differ in {bad_cols}")
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                print(f"  row {i} col {c}: spark={got[c][i]!r} oracle={want[c][i]!r}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    # queries with no oracle: rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracles:
            try:
                n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
                print(f"ROWS {name}: {n} rows {'PASS' if n > 0 else 'FAIL'}")
                if n > 0: n_pass += 1
                else: n_fail += 1
            except Exception as e:
                print(f"FAIL {name} (rows-only): {e}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
