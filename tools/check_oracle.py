#!/usr/bin/env python3
"""Self-check harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir in <verifyOutDir>, loads the Spark parquet result and the
oracle SQL (oracle_sql.json) run by DuckDB over the same testdata parquet,
sorts columns by name and rows by all columns, and compares values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # stable sort by all columns for row-order independence
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (directory of part files) — e.g. the
            # staged 96-dim corpus — vs the driver's single-file layout
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"  {name}: rows-only ({len(spark_df)} rows) " +
                  ("PASS" if len(spark_df) > 0 else "FAIL-EMPTY"))
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  {name}: ORACLE-SQL-ERROR {e}")
            n_fail += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"  {name}: SCHEMA-MISMATCH spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"  {name}: ROWCOUNT-MISMATCH spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        ok = True
        for c in s.columns:
            sv, dv = s[c].values, d[c].values
            # the driver hashes stringified values: int64 99111 vs float64
            # 99111.0 is a mismatch even when numerically equal
            s_float = np.issubdtype(s[c].dtype, np.floating)
            d_float = np.issubdtype(d[c].dtype, np.floating)
            if s_float != d_float:
                print(f"  {name}.{c}: DTYPE-KIND-MISMATCH spark={s[c].dtype} duck={d[c].dtype}")
                ok = False
                continue
            if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(d[c].dtype, np.floating):
                eq = np.allclose(sv.astype(float), dv.astype(float), rtol=0, atol=0, equal_nan=True)
                exact = eq
                if not eq:
                    close = np.allclose(sv.astype(float), dv.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True)
                    md = np.nanmax(np.abs(sv.astype(float) - dv.astype(float)))
                    print(f"  {name}.{c}: FLOAT-DIFF exact=False close={close} maxdiff={md:.3e}")
                    ok = False
            else:
                sv2 = pd.Series(sv).astype(str).values
                dv2 = pd.Series(dv).astype(str).values
                if not (sv2 == dv2).all():
                    bad = np.where(sv2 != dv2)[0][:3]
                    print(f"  {name}.{c}: VALUE-MISMATCH at rows {bad.tolist()} spark={sv2[bad].tolist()} duck={dv2[bad].tolist()}")
                    ok = False
        if ok:
            n_pass += 1
            print(f"  {name}: PASS ({len(s)} rows)")
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
