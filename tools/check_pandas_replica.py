#!/usr/bin/env python3
"""Replica of the DRIVER's comparison semantics (pandas sort/hash), as
opposed to tools/check_oracle.py's repr-tuple compare. The driver sorts
columns by name, then sort_values over all columns, then hashes — which
CRASHES on array/object columns (see CORRECTNESS_r03 a8_group_evidence).
This catches any query whose Spark output or oracle output is not
pandas-sortable, before the driver does.

Usage: python3 tools/check_pandas_replica.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def frame_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for col in df.columns:
        h.update(col.encode())
        for v in df[col]:
            h.update(repr(v).encode())
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        if not glob.glob(f"{pdir}/*.parquet"):
            print(f"MISSING  {name}")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM parquet_scan('{pdir}/*.parquet')").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            gh = frame_hash(got)
        except Exception as e:
            print(f"UNSORTABLE-SPARK {name}: {str(e)[:120]}")
            n_fail += 1
            continue
        try:
            wh = frame_hash(want)
        except Exception as e:
            print(f"UNSORTABLE-ORACLE {name}: {str(e)[:120]}")
            n_fail += 1
            continue
        rows_ok = len(got) == len(want)
        schema_ok = sorted(got.columns) == sorted(want.columns)
        if rows_ok and schema_ok and gh == wh:
            print(f"OK       {name}: {len(got)} rows")
            n_pass += 1
        else:
            print(f"FAIL     {name}: rows {len(got)}/{len(want)} "
                  f"schema_ok={schema_ok} hash_ok={gh == wh}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
