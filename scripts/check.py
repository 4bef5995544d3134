#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
corresponding oracle_sql.json entry in DuckDB against the sfDir parquet
tables, sorts columns by name and rows by all columns, and compares values.
"""
import json, sys, glob, os, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

import datetime

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype) in ("int8", "int16", "int32"):
            # width doesn't change the hashed value string; int vs float does
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], (datetime.date, datetime.datetime)):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    oracle_secs = {}
    for name in sorted(oracles):
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"FAIL {name}: query produced no output dir"); n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        files = glob.glob(f"{path}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            if len(got) > 0:
                print(f"ROWS-ONLY {name}: {len(got)} rows")
            else:
                print(f"FAIL {name}: rows-only query returned 0 rows"); n_fail += 1
            continue
        try:
            t0 = time.monotonic()
            exp = con.execute(oracles[name]).df()
            oracle_secs[name] = round(time.monotonic() - t0, 3)
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        gd, ed = list(map(str, g.dtypes)), list(map(str, e.dtypes))
        if gd != ed:
            # int-vs-float repr diverges in the driver's value hash (364 vs 364.0)
            print(f"FAIL {name}: dtypes {gd} vs {ed}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"PASS {name}: {len(g)} rows"); n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name}: value mismatch\n{str(ex)[:500]}"); n_fail += 1
    # per-query DuckDB wall times (execute + df materialization): the
    # engine-vs-engine baseline raw material — BASELINE_QUERIES.json is
    # built from this instead of re-running the multi-hour oracles
    with open(os.path.join(out_dir, "oracle_seconds.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "oracle_seconds": oracle_secs}, f,
                  indent=1, sort_keys=True)
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
