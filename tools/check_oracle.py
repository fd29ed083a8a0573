#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle comparator.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in <outDir>, executes the matching oracle SQL in
DuckDB over the same testdata tables, and compares row count, column
names/types, and a hash over the value-sorted result.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Sort columns by name, then rows by all columns; return list of row
    tuples with floats rounded for display-insensitive comparison."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    failures = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"[FAIL] {name}: no spark output")
            failures += 1
            continue
        spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"[FAIL] {name}: columns {list(s.columns)} != {list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"[FAIL] {name}: rows {len(s)} != {len(d)}")
            failures += 1
            continue
        if [str(t) for t in s.dtypes] != [str(t) for t in d.dtypes]:
            print(f"[WARN] {name}: dtypes {list(map(str, s.dtypes))} != {list(map(str, d.dtypes))}")
        if not s.equals(d):
            neq = (s != d) & ~(s.isna() & d.isna())
            bad = neq.any(axis=1)
            print(f"[FAIL] {name}: {int(bad.sum())} mismatched rows; first:")
            print(s[bad].head(3))
            print(d[bad].head(3))
            failures += 1
            continue
        print(f"[ OK ] {name}: {len(s)} rows")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
