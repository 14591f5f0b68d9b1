#!/usr/bin/env python3
"""Dev-only mirror of the driver's DuckDB oracle harness (NOT part of the
library; uses driver-side-only packages). Compares each SparkEntry query's
parquet dump against its oracleSql run in DuckDB on the same testdata:
schema (column names sorted), row count, and exact values (rows sorted).

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/vout
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = con.sql(sql).df()
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            if sorted(exp.columns) != sorted(got.columns):
                print(f"FAIL {name}: columns spark={sorted(got.columns)} duck={sorted(exp.columns)}")
                fail += 1; continue
            e, g = canon(exp), canon(got)
            if len(e) != len(g):
                print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}")
                fail += 1; continue
            e = e.astype(str); g = g.astype(str)
            neq = (e != g).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                print(f"FAIL {name}: value mismatch at row {i}\n  duck : {e.loc[i].to_dict()}\n  spark: {g.loc[i].to_dict()}")
                fail += 1; continue
            print(f"ok   {name} ({len(e)} rows)")
            ok += 1
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:300]}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail (of {len(oracles)} oracle queries)")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
