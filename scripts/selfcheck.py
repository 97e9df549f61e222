#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (NOT part of the library).

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [name ...]

For each query dumped by `graft.Verify` into <verifyOutDir>/<name>/, run the
matching SQL from oracle_sql.json in DuckDB over views of <sfDir>/*.parquet,
then compare: columns sorted by name, rows sorted, every cell canonicalised
to a string (floats at full repr precision => demands exact float64 match,
stricter than the driver's hash). Prints PASS/FAIL per query.
"""
import sys, json, os, glob
import duckdb
import pandas as pd
import numpy as np
import decimal
import datetime

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if np.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, (np.floating,)):
        return canon_cell(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v.normalize())
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if v is pd.NaT:
        return "NULL"
    return str(v)


def canon_frame(df):
    if df is None:
        return None
    cols = sorted(df.columns)
    rows = []
    for _, r in df[cols].iterrows():
        rows.append(tuple(canon_cell(r[c]) for c in cols))
    rows.sort()
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    # Enumerate from oracle keys ∪ dumped dirs: a query that threw in
    # Verify leaves no dir and must surface as MISSING, not vanish.
    dumped = set(d for d in os.listdir(out_dir)
                 if os.path.isdir(os.path.join(out_dir, d)))
    names = sorted(set(oracle) | dumped)
    n_pass = n_fail = n_noracle = 0
    for name in names:
        if only and name not in only:
            continue
        if name not in dumped:
            print(f"MISSING {name}: oracle present but Verify dumped nothing")
            n_fail += 1
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"EMPTY  {name}: no parquet written")
            n_fail += 1
            continue
        spark_df = pd.read_parquet(files[0])
        # The driver's comparator crashes on array/map cells (lexsort on
        # ndarray) — mimic that as a hard failure at the boundary.
        bad_cols = [c for c in spark_df.columns if len(spark_df) and
                    isinstance(spark_df[c].iloc[0], (np.ndarray, list, dict))]
        if bad_cols and name in oracle:
            print(f"FAIL   {name}: array/map-typed output cols {bad_cols} "
                  f"would crash the driver comparator — serialize at boundary")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"NOORA  {name}: rows={len(spark_df)} (rows-only check)")
            n_noracle += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL   {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc, sr = canon_frame(spark_df)
        dc, dr = canon_frame(duck_df)
        if sc != dc:
            print(f"FAIL   {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
        elif sr != dr:
            n_fail += 1
            print(f"FAIL   {name}: rows spark={len(sr)} duck={len(dr)}")
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            for a, b in diffs:
                print(f"   spark: {a}\n   duck : {b}")
            if len(sr) != len(dr):
                print(f"   spark extra: {sr[:2]}  duck extra: {dr[:2]}")
        else:
            print(f"PASS   {name}: {len(sr)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} no-oracle ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
