#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out`.

Reads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name and rows by all values, and
hash-compares the stringified frames.
"""
import glob
import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps → iso strings, floats → repr w/ rounding
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.strftime("%Y-%m-%d %H:%M:%S")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def frame_hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    result_dirs = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    for name in result_dirs:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"  {name}: NO RESULT FILES")
            n_fail += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        if name not in oracle:
            status = f"rows-only ({len(got)} rows)"
            ok = len(got) > 0
        else:
            try:
                want = canon(con.execute(oracle[name]).fetchdf())
            except Exception as e:
                print(f"  {name}: ORACLE SQL ERROR: {e}")
                n_fail += 1
                continue
            schema_ok = list(got.columns) == list(want.columns)
            rows_ok = len(got) == len(want)
            hash_ok = schema_ok and rows_ok and frame_hash(got) == frame_hash(want)
            ok = hash_ok
            status = "MATCH" if ok else (
                f"MISMATCH schema_ok={schema_ok} rows {len(got)}vs{len(want)}")
            if not ok and schema_ok and rows_ok:
                diff = got.compare(want) if got.shape == want.shape else None
                if diff is not None and not diff.empty:
                    status += f"\n{diff.head(10)}"
        print(f"  {name}: {status}")
        n_pass += ok
        n_fail += (not ok)
    print(f"{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
