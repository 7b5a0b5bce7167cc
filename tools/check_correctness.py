#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's
DuckDB compare: run Verify output vs oracle_sql.json over the same sf dir.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet")
            failures += 1
            continue
        try:
            mine = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            ref = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(ref.columns)}")
            failures += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(mine, ref, check_dtype=False,
                                          check_exact=True)
            print(f"OK   {name}: rows={len(mine)}")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
