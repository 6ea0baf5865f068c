#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare."""
import duckdb, json, sys, glob, os
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok, bad = [], []
for name in sorted(os.listdir(out)):
    p = f"{out}/{name}"
    if not os.path.isdir(p):
        continue
    spark_df = con.sql(f"SELECT * FROM '{p}/*.parquet'").df()
    if name not in oracle:
        ok.append((name, f"rows-only rows={len(spark_df)}"))
        continue
    try:
        ora_df = con.sql(oracle[name]).df()
    except Exception as e:
        bad.append((name, f"ORACLE SQL ERROR: {e}"))
        continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = ora_df.reindex(sorted(ora_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        bad.append((name, f"COLS spark={list(a.columns)} oracle={list(b.columns)}"))
        continue
    if len(a) != len(b):
        bad.append((name, f"ROWS spark={len(a)} oracle={len(b)}"))
        continue
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    # dtype compare
    dt_mismatch = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns if str(a[c].dtype) != str(b[c].dtype)]
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)
        msg = f"match rows={len(a)}"
        if dt_mismatch: msg += f" (dtypes {dt_mismatch})"
        ok.append((name, msg))
    except AssertionError as e:
        # find first differing cell
        diff = None
        for c in a.columns:
            neq = a[c].ne(b[c])
            # handle NaN==NaN
            neq &= ~(a[c].isna() & b[c].isna())
            if neq.any():
                i = neq.idxmax()
                diff = (c, i, a[c][i], b[c][i])
                break
        bad.append((name, f"VALUES dtypes={dt_mismatch} first_diff={diff}"))

for n, m in ok: print(f"  OK  {n}: {m}")
for n, m in bad: print(f" FAIL {n}: {m}")
print(f"\n{len(ok)} ok, {len(bad)} fail")
