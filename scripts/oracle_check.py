#!/usr/bin/env python3
"""Dev-loop mirror of the driver's correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

Loads each `<verifyOutDir>/<name>` parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against views named after the test
tables, sorts columns by name, and compares values exactly.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracle):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp = con.sql(oracle[name]).df()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                raise AssertionError(f"columns {list(g.columns)} != {list(e.columns)}")
            pd.testing.assert_frame_equal(g, e, check_exact=True, check_dtype=False)
            print(f"PASS {name} ({len(g)} rows)")
        except Exception as ex:
            n_fail += 1
            msg = str(ex).replace("\n", " | ")[:400]
            print(f"FAIL {name}: {msg}")
    print(f"{'OK' if n_fail == 0 else 'FAILURES'}: {len(oracle) - n_fail}/{len(oracle)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
