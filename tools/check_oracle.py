#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle_sql.json entry in DuckDB over <sfDir>/*.parquet views, sorts columns
by name and rows by value, and compares cell-by-cell (exact for
strings/ints; tiny-rel-tol report for floats so FP diffs are visible
before the driver's stricter hash compare flags them).
"""
import sys, json, glob, math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output");  failed.append(name); continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); failed.append(name); continue
        if list(got.columns) != list(exp.columns):
            print(f"[COLS] {name}: spark={list(got.columns)} duckdb={list(exp.columns)}")
            failed.append(name); continue
        if len(got) != len(exp):
            print(f"[ROWS] {name}: spark={len(got)} duckdb={len(exp)}")
            failed.append(name); continue
        bad = 0
        fuzzy = 0  # non-identical but within tolerance: the driver's hash
        # compare is exact, so these WILL fail there — surface them loudly.
        for c in got.columns:
            a, b = got[c].values, exp[c].values
            for i in range(len(a)):
                x, y = a[i], b[i]
                if isinstance(x, float) and isinstance(y, float):
                    if x != y and not (math.isnan(x) and math.isnan(y)):
                        if abs(x - y) > 1e-9 * max(1.0, abs(x), abs(y)):
                            bad += 1
                            if bad <= 3:
                                print(f"       {name}.{c}[{i}]: {x!r} != {y!r}")
                        else:
                            fuzzy += 1
                            if fuzzy <= 3:
                                print(f"       {name}.{c}[{i}]: {x!r} ~= {y!r} "
                                      "(within tol; driver hash will MISMATCH)")
                elif str(x) != str(y):
                    bad += 1
                    if bad <= 3:
                        print(f"       {name}.{c}[{i}]: {x!r} != {y!r}")
        if bad or fuzzy:
            print(f"[VALS] {name}: {bad} mismatched, {fuzzy} within-tol cells")
            failed.append(name)
        else:
            print(f"[ OK ] {name}: {len(got)} rows x {len(got.columns)} cols")
    if failed:
        print(f"\nFAILED: {failed}"); sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
