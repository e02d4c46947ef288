#!/usr/bin/env python3
"""Local differential harness mirroring the driver's DuckDB-oracle compare:
run graft.Verify first, then this script compares each <out>/<name> parquet
against the oracle SQL run in DuckDB on the same raw tables.

Usage: python3 tools/diffcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math, decimal

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    # Replicate the driver's asymmetry: a parquet DECIMAL read via pyarrow
    # stays a Python Decimal whose str() keeps trailing zeros
    # (Decimal('1335751.80')), while DuckDB's .df() renders DECIMAL/DOUBLE
    # as float64 (repr '1335751.8'). Do NOT normalize Decimal to float here
    # — a decimal column surviving to a query's output must FAIL locally,
    # exactly as it fails the driver's hash gate (round-1 lesson).
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_rows(df):
    cols = sorted(df.columns)
    return [tuple(canon(v) for v in row) for row in df[cols].itertuples(index=False)], cols


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            # pandas/pyarrow (NOT duckdb read_parquet) for the Spark side:
            # pyarrow preserves DECIMAL as Python Decimal, like the driver.
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        s_rows, s_cols = frame_rows(spark_df)
        d_rows, d_cols = frame_rows(duck_df)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if s_rows == d_rows:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
            continue
        if sorted(s_rows) == sorted(d_rows):
            print(f"WARN {name}: rows equal but ORDER differs ({len(s_rows)} rows)")
            n_fail += 1
            continue
        print(f"FAIL {name}: rows differ (spark={len(s_rows)}, duck={len(d_rows)})")
        ss, ds = set(s_rows), set(d_rows)
        for r in list(ss - ds)[:3]:
            print(f"  spark-only: {r}")
        for r in list(ds - ss)[:3]:
            print(f"  duck-only:  {r}")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
