#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Replicates the documented methodology: for each query, read the Spark
parquet output, run the oracle SQL in DuckDB over the same testdata
tables, sort columns by name, sort rows, and compare values exactly.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} oracle={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            n_fail += 1
            continue
        schema_note = ""
        if [str(d) for d in g.dtypes] != [str(d) for d in w.dtypes]:
            schema_note = f" [dtype diff: {list(zip(g.columns, g.dtypes, w.dtypes))}]"
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows){schema_note}")
            n_pass += 1
        except AssertionError as e:
            msg = str(e).splitlines()
            print(f"FAIL {name}: values differ{schema_note}")
            # show first differing cells
            diff = (g != w) & ~(g.isna() & w.isna())
            bad = diff.any(axis=1)
            show = g[bad].head(3), w[bad].head(3)
            print("  spark:\n", show[0].to_string(), "\n  oracle:\n",
                  show[1].to_string())
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
