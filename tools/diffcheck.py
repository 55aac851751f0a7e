#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: for each query output
parquet under OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB over views named after the testdata tables, and compare (schema,
row count, exact value hash with columns sorted by name).

Usage: diffcheck.py SFDIR OUTDIR
"""
import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)]


def df_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        for v in s.tolist():
            if isinstance(v, float):
                h.update(f"{v!r}".encode())
            else:
                h.update(str(v).encode())
        h.update(b"|")
    return h.hexdigest()


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    failures = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        got = canon(pd.read_parquet(d)).reset_index(drop=True)
        if name not in oracles:
            print(f"{name:22s} rows-only: {len(got)} rows"
                  + ("  ** EMPTY **" if len(got) == 0 else ""))
            if len(got) == 0:
                failures += 1
            continue
        want = canon(con.execute(oracles[name]).df()).reset_index(drop=True)
        ok_schema = list(got.columns) == list(want.columns)
        ok_rows = len(got) == len(want)
        ok_hash = ok_schema and ok_rows and df_hash(got) == df_hash(want)
        status = "OK" if ok_hash else "FAIL"
        print(f"{name:22s} {status}  rows={len(got)}/{len(want)} "
              f"schema={'ok' if ok_schema else f'{list(got.columns)} vs {list(want.columns)}'}")
        if not ok_hash:
            failures += 1
            if ok_schema and ok_rows:
                # locate the first mismatching value
                for col in got.columns:
                    g, w = got[col], want[col]
                    neq = (g.astype(str) != w.astype(str))
                    if neq.any():
                        i = neq.idxmax()
                        print(f"    first diff col={col} row={i}: "
                              f"got={g[i]!r} want={w[i]!r}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
