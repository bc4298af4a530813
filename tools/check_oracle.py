#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare Verify output
parquet against DuckDB oracle SQL for the given query names (or all
present in the out dir)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3].split(",") if len(sys.argv) > 3 else None

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

fail = 0
for name in sorted(names or oracle.keys()):
    d = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fail += 1; continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files])
    if name not in oracle:
        print(f"{name}: no_oracle rows={len(spark_df)}"); continue
    want = con.sql(oracle[name]).df()
    ok_rows = len(spark_df) == len(want)
    scols = sorted(spark_df.columns); wcols = sorted(want.columns)
    ok_schema = scols == wcols
    ok_hash = False
    if ok_rows and ok_schema:
        a = spark_df[scols].reset_index(drop=True)
        b = want[wcols].reset_index(drop=True)
        a = a.sort_values(scols).reset_index(drop=True)
        b = b.sort_values(wcols).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=False, rtol=1e-9, atol=1e-9)
            ok_hash = True
        except AssertionError as e:
            ok_hash = False
            err = str(e).splitlines()[0:4]
    status = "PASS" if (ok_rows and ok_schema and ok_hash) else "FAIL"
    if status == "FAIL":
        fail += 1
        print(f"{name}: {status} rows {len(spark_df)}/{len(want)} schema {scols} vs {wcols}")
        if ok_rows and ok_schema:
            print("  " + "\n  ".join(err))
    else:
        print(f"{name}: {status} rows={len(spark_df)}")
sys.exit(1 if fail else 0)
