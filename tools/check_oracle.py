#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle comparison.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mirrors the driver: registers each testdata parquet as a DuckDB view,
runs every oracle_sql.json query, loads the Spark parquet result, sorts
columns by name (and rows by all columns), and compares values.
Dev tool only — the shipped Scala library has no Python dependency.
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        w, g = canon(want), canon(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_bad += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_bad += 1
            continue
        try:
            import pandas.testing as pt
            pt.assert_frame_equal(w, g, check_dtype=False, check_exact=True)
            print(f"OK   {name} ({len(w)} rows)")
            n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:400]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
