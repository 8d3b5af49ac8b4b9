#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL from
Verify's oracle_sql.json in DuckDB over the testdata parquet tables, and
compare value-for-value with the Spark result parquet that Verify wrote.

Usage: python3 scripts/check_oracle.py <sf_dir> <verify_out_dir> [query ...]
"""
import json
import sys
import glob
import os

import duckdb


def norm(df):
    # align with the driver: sort columns by name, then sort rows.
    # Normalize NULLs first: Spark parquet loads them as None, DuckDB .df()
    # as NaN/NaT — string coercion would otherwise flag false mismatches.
    import pandas as pd
    df = df.astype(object).where(pd.notna(df), "NULL")
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for q, sql in sorted(oracle.items()):
        if only and q not in only:
            continue
        spark_path = f"{out_dir}/{q}"
        if not os.path.isdir(spark_path) and not os.path.isdir(spark_path + ".parquet"):
            print(f"[MISS] {q}: no spark output")
            n_fail += 1
            continue
        if os.path.isdir(spark_path + ".parquet"):
            spark_path += ".parquet"
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"[ORACLE-ERR] {q}: {str(e)[:300]}")
            n_fail += 1
            continue
        spark_df = con.execute(
            f"SELECT * FROM '{spark_path}/*.parquet'").df()
        a, b = norm(oracle_df), norm(spark_df)
        if list(a.columns) != list(b.columns):
            print(f"[SCHEMA] {q}: oracle={list(a.columns)} spark={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"[ROWS] {q}: oracle={len(a)} spark={len(b)}")
            n_fail += 1
            continue
        # compare as strings to dodge dtype mismatches (int32 vs int64 etc.)
        mism = (a.astype(str) != b.astype(str))
        if mism.any().any():
            cols = [c for c in a.columns if mism[c].any()]
            idx = mism.any(axis=1)
            print(f"[VALUES] {q}: {int(idx.sum())}/{len(a)} rows differ in {cols}")
            bad = idx[idx].index[:3]
            for i in bad:
                print(f"    oracle: {a.loc[i].to_dict()}")
                print(f"    spark : {b.loc[i].to_dict()}")
            n_fail += 1
            continue
        print(f"[OK] {q} ({len(a)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
