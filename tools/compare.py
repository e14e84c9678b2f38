#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.
Usage: compare.py <verify_out_dir> <sf_dir>"""
import duckdb, json, os, sys
out, sfdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ["documents","embeddings","lineitem","orders","events","part",
          "customer","supplier","nation","region"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
fails = 0
for name in sorted(os.listdir(out)):
    p = os.path.join(out, name)
    if not os.path.isdir(p): continue
    try:
        spark = con.execute(f"SELECT * FROM '{p}/*.parquet'").fetchdf()
    except Exception as e:
        print(f"{name}: READ_ERR {e}"); fails += 1; continue
    if name not in oracle:
        print(f"{name}: rows-only ({len(spark)} rows)"); continue
    try:
        ora = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE_ERR {e}"); fails += 1; continue
    s = spark.reindex(sorted(spark.columns), axis=1)
    o = ora.reindex(sorted(ora.columns), axis=1)
    if list(s.columns) != list(o.columns):
        print(f"{name}: SCHEMA_MISMATCH spark={list(s.columns)} oracle={list(o.columns)}")
        fails += 1; continue
    if len(s) != len(o):
        print(f"{name}: ROW_COUNT {len(s)} vs {len(o)}"); fails += 1; continue
    s2 = s.sort_values(by=list(s.columns)).reset_index(drop=True).astype(str)
    o2 = o.sort_values(by=list(o.columns)).reset_index(drop=True).astype(str)
    if s2.equals(o2):
        print(f"{name}: MATCH ({len(s)} rows)")
    else:
        diff = (s2 != o2).any(axis=1)
        idx = diff[diff].index[:2]
        print(f"{name}: VALUE_MISMATCH " +
              str([(s2.loc[i].to_dict(), o2.loc[i].to_dict()) for i in idx])[:400])
        fails += 1
sys.exit(1 if fails else 0)
