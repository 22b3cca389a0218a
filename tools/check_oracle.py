#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same testdata
tables, and compares exactly: columns sorted by name, rows sorted by all
columns, values compared for exact equality (floats bit-for-bit).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = canon(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            want = canon(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} "
                  f"vs oracle {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: {len(got)} rows vs oracle {len(want)}")
            n_fail += 1
            continue
        # dtype-KIND-strict: the driver hashes values type-aware, so an
        # oracle that returns HUGEINT (-> float64) where Spark writes int64
        # fails there even when values compare equal (the q124/r06 class).
        # Width within a kind (int32 vs int64) is fine — the driver
        # canonicalizes it (16 int32-column queries passed r06's hash).
        def kind(dt):
            k = dt.kind
            return "i" if k in "iu" else k
        dtype_diff = [(c, str(got[c].dtype), str(want[c].dtype))
                      for c in got.columns
                      if kind(got[c].dtype) != kind(want[c].dtype)]
        if dtype_diff:
            n_fail += 1
            print(f"FAIL {name}: dtype mismatch "
                  + ", ".join(f"{c} spark={g} oracle={w}"
                              for c, g, w in dtype_diff))
            continue
        # exact compare; surface first few diffs
        neq = (got != want) & ~(got.isna() & want.isna())
        if neq.to_numpy().any():
            n_fail += 1
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ")
            idx = got.index[bad][:3]
            for i in idx:
                print(f"  spark : {got.loc[i].to_dict()}")
                print(f"  oracle: {want.loc[i].to_dict()}")
        else:
            print(f"ok   {name} ({len(got)} rows)")
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
