#!/usr/bin/env python3
"""Compare one /tmp/smoke_out/<name>.parquet dump against an oracle SQL
taken from oracle_sql.json-style inline text (passed via stdin) — a
single-query version of tools/check.py for fast iteration."""
import sys, duckdb, pandas as pd

name = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
sql = sys.stdin.read()

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

spark = duckdb.connect().execute(
    f"SELECT * FROM '/tmp/smoke_out/{name}.parquet/*.parquet'").df()
oracle = con.execute(sql).df()

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

s, o = norm(spark), norm(oracle)
print(f"{name}: spark_rows={len(s)} oracle_rows={len(o)} "
      f"spark_cols={list(s.columns)} oracle_cols={list(o.columns)}")
if len(s) != len(o) or list(s.columns) != list(o.columns):
    print("MISMATCH shape"); sys.exit(1)
for c in s.columns:
    sc, oc = s[c], o[c]
    try:
        eq = (sc.astype(str) == oc.astype(str)).all()
    except Exception as e:
        eq = False
    if not eq:
        bad = (sc.astype(str) != oc.astype(str))
        i = bad.idxmax()
        print(f"MISMATCH col {c} at row {i}: spark={sc[i]!r} oracle={oc[i]!r}")
        sys.exit(1)
print("MATCH")
