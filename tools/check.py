#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Loads each <verifyOutDir>/<name> parquet result, runs the matching SQL from
<verifyOutDir>/oracle_sql.json in DuckDB (tables = parquet files in sfDir),
sorts columns by name and rows by all columns, and compares values exactly.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
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
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_bad += 1
            continue
        try:
            rel = con.sql(sql)
            # HUGEINT tripwire (the r3 trap, reintroduced in r15 as
            # a5_heavy_hitters): an integer SUM / windowed SUM left uncast
            # is HUGEINT in DuckDB, and the driver's hash canonicalizes it
            # as float — never value-exact against Spark's BIGINT. Catch it
            # by TYPE at the local gate so it can't reach the driver.
            huge = [c for c, t in zip(rel.columns, rel.types)
                    if str(t).upper() in ("HUGEINT", "INT128", "UHUGEINT")]
            if huge:
                print(f"FAIL {name}: oracle outputs HUGEINT column(s) {huge} — "
                      f"wrap in CAST(... AS BIGINT) (r3 trap)")
                n_bad += 1
                continue
            exp = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(x.columns)}")
            n_bad += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} != {len(x)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, x, check_dtype=False, check_exact=True)
            print(f"OK   {name} ({len(g)} rows)")
            n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:1500]}")
            mism = (g != x) & ~(g.isna() & x.isna())
            bad_rows = mism.any(axis=1)
            print("spark:\n", g[bad_rows].head(5))
            print("duck :\n", x[bad_rows].head(5))
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
