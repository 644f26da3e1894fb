#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare each Verify
parquet dump against its DuckDB oracle on the same testdata tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(run `sbt -batch "runMain graft.Verify <sfDir> <verifyOutDir>"` first)
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]

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
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no parquet output")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM parquet_scan('{pdir}/*.parquet')")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        try:
            want = con.sql(sql)
            wcols = [d[0] for d in want.description]
            wrows = want.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        gn, gc = norm(grows, gcols)
        wn, wc = norm(wrows, wcols)
        if gc != wc:
            print(f"SCHEMA   {name}: spark={gc} oracle={wc}")
            n_fail += 1
        elif gn != wn:
            diff_g = [r for r in gn if r not in set(wn)][:3]
            diff_w = [r for r in wn if r not in set(gn)][:3]
            print(f"VALUES   {name}: rows spark={len(gn)} oracle={len(wn)}")
            print(f"   spark-only: {diff_g}")
            print(f"   oracle-only: {diff_w}")
            n_fail += 1
        else:
            print(f"OK       {name}: {len(gn)} rows")
            n_pass += 1
    # rows-only queries (no oracle)
    for pdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(pdir.rstrip("/"))
        if name not in oracle:
            files = glob.glob(f"{pdir}/*.parquet")
            n = con.sql(f"SELECT count(*) FROM parquet_scan('{pdir}/*.parquet')").fetchone()[0] if files else -1
            print(f"ROWSONLY {name}: {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
