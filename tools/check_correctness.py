#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's compare.

Driver-equivalence matters (round-2 lesson): the driver reads the SPARK result
parquet with pyarrow/pandas — which yields python `Decimal` objects for
DECIMAL columns ('253942.00') and numpy arrays for list columns — but fetches
the DuckDB oracle as pandas float64 ('253942.0'). A checker that reads BOTH
sides through DuckDB (as this script did in round 2) is blind to that
representation class and validated 40/40 locally while the driver failed 13.

So: Spark side = pd.read_parquet (pyarrow, Decimals preserved), oracle side =
duckdb fetchdf, columns sorted by name, rows sorted by all columns
(sort_values — crashes on unhashable ndarray cells exactly like the driver),
then cell-wise canonical-string compare.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [queryFilter]
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


def canon(df: pd.DataFrame) -> list:
    """Rows as tuples of canonical strings — what the driver's hash sees."""
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(str(v) for v in row))
    return out


def main(sf_dir: str, out_dir: str, only: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # multi-file (directory-shaped) table
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    checked = 0
    for name, sql in sorted(oracle.items()):
        if only and only not in name:
            continue
        checked += 1
        res_dir = f"{out_dir}/{name}"
        files = sorted(glob.glob(f"{res_dir}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet")
            failures += 1
            continue
        try:
            mine = norm(pd.concat([pd.read_parquet(f) for f in files],
                                  ignore_index=True))
            ref = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
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
        a, b = canon(mine), canon(ref)
        if a != b:
            bad = next(i for i in range(len(a)) if a[i] != b[i])
            print(f"FAIL {name}: hash mismatch, first diff row {bad}:\n"
                  f"  spark : {a[bad]}\n  oracle: {b[bad]}")
            failures += 1
        else:
            print(f"OK   {name}: rows={len(mine)}")
    print(f"\n{checked - failures}/{checked} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None))
