#!/usr/bin/env python3
"""Self-check harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir in <verifyOutDir>, loads the Spark parquet result and the
oracle SQL (oracle_sql.json) run by DuckDB over the same testdata parquet,
sorts columns by name and rows by all columns, and compares values.

Contract with Verify.scala (round 16): a thrown query leaves a
``<name>_FAILED`` sentinel (plus an errors.json entry) next to where its
parquet would have been — this compare reads the sentinel FIRST, so a
regression that throws can never be reported PASS against a stale previous
run's output. Exit status is nonzero on any failure (sentinel, rows-only
empty, oracle mismatch, or an oracled query with no output at all).
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
        try:
            if os.path.isdir(p):
                # Spark-written table (directory of part files) — e.g. the
                # staged 96-dim corpus — vs the driver's single-file layout
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
            elif os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        except Exception as e:
            # an interrupted staging can leave an empty table dir — keep
            # checking the queries that don't read it instead of aborting
            print(f"  [warn] table {t}: view creation failed ({e})")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify writes the names it actually RAN; entries outside it are a
    # previous run's leftovers in a reused outDir — skipping them keeps a
    # stale oracled result from reading as "rows-only PASS" after a
    # filtered re-run narrowed the oracle dump
    manifest = None
    mpath = f"{out_dir}/run_manifest.json"
    if os.path.exists(mpath):
        manifest = set(json.load(open(mpath)))
    n_pass = n_fail = n_stale = 0
    seen = set()
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        base = name[:-len("_FAILED")] if name.endswith("_FAILED") else name
        if manifest is not None and base not in manifest and (
                os.path.isdir(qdir) or name.endswith("_FAILED")):
            n_stale += 1
            continue
        # sentinel-first (the Verify.scala contract): a thrown query must
        # read as THREW, never as PASS against stale output
        if name.endswith("_FAILED") and os.path.isfile(qdir):
            qname = name[:-len("_FAILED")]
            head = open(qdir).readline().strip()
            print(f"  {qname}: THREW ({head})")
            n_fail += 1
            seen.add(qname)
            continue
        if not os.path.isdir(qdir):
            continue
        seen.add(name)
        if os.path.isfile(os.path.join(out_dir, name + "_FAILED")):
            continue  # reported via the sentinel branch above
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"  {name}: NO-OUTPUT (dir exists, no parquet part files)")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            if len(spark_df) > 0:
                print(f"  {name}: rows-only ({len(spark_df)} rows) PASS")
            else:
                print(f"  {name}: rows-only FAIL-EMPTY")
                n_fail += 1
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
            if s_float:
                svf, dvf = sv.astype(float), dv.astype(float)
                eq = np.allclose(svf, dvf, rtol=0, atol=0, equal_nan=True)
                # the driver compares STRINGS, where -0.0 != 0.0 even
                # though allclose treats them equal — mimic it (masked to
                # non-NaN rows: matching NaNs may differ in sign bit)
                num = ~(np.isnan(svf) | np.isnan(dvf))
                if eq and not (np.signbit(svf[num]) == np.signbit(dvf[num])).all():
                    print(f"  {name}.{c}: SIGNED-ZERO-MISMATCH (-0.0 vs 0.0 — the driver's string hash flags this)")
                    ok = False
                elif not eq:
                    close = np.allclose(svf, dvf, rtol=1e-9, atol=1e-9, equal_nan=True)
                    diff = np.abs(svf - dvf)
                    md = np.nanmax(diff) if not np.isnan(diff).all() else float("nan")
                    print(f"  {name}.{c}: FLOAT-DIFF exact=False close={close} maxdiff={md:.3e}" +
                          (" (NaN-vs-value positions present)" if np.isnan(diff).any() else ""))
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
    # an oracled query with NO output at all (Verify killed mid-sweep)
    # must not silently drop out of verification
    for name in sorted(set(oracles) - seen):
        print(f"  {name}: MISSING (oracle declared, no output dir or sentinel)")
        n_fail += 1
    stale = f" ({n_stale} stale entries outside run_manifest skipped)" if n_stale else ""
    print(f"== {n_pass} pass, {n_fail} fail =={stale}")
    return n_fail

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
