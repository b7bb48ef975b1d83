#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet written by `graft.Verify` (via pandas, like the
driver — NOT via DuckDB, whose parquet reader would mask dtype drift), runs
the matching SQL from oracle_sql.json in DuckDB over the same sfDir tables,
and compares: row count, column names (sorted), and STRING-RENDERED values
after sorting columns by name and rows by all columns — the driver's gate
hash-compares string forms, so `99111` (Spark BIGINT) vs `99111.0` (DuckDB
HUGEINT→float64) must FAIL here exactly as it fails there. Exits non-zero
if anything mismatches.
"""
import sys, os, json, glob, datetime
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # make list/array cells hashable+sortable for the row sort
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)

def eq(a, b):
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    # string forms, like the driver's hash: int64 99111 != float64 99111.0.
    # Date-likes are normalized first (driver r04 accepted Spark DATE vs
    # DuckDB midnight TIMESTAMP for q95/q98, so don't be stricter there).
    def norm(v):
        if isinstance(v, (datetime.date, datetime.datetime, np.datetime64)):
            return str(pd.Timestamp(v))
        return str(v)
    return norm(a) == norm(b)

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = canon(pd.concat(
                [pd.read_parquet(f) for f in sorted(files)], ignore_index=True))
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1; continue
        bad = None
        for i in range(len(spark_df)):
            for c in spark_df.columns:
                if not eq(spark_df[c].iloc[i], duck_df[c].iloc[i]):
                    bad = (i, c, spark_df[c].iloc[i], duck_df[c].iloc[i]); break
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
