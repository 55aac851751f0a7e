#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: for each query output
parquet under OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB over views named after the testdata tables, and compare (schema,
row count, exact value hash with columns sorted by name).

Fails CLOSED: every query expected in OUTDIR (the optional comma-separated
QUERY list if given, else Verify's attempted.json manifest — the full set
of queries the Verify run tried, including rows-only ones with no oracle —
else the oracle_sql.json key set) with no output dir — i.e. its Verify run
crashed — counts as a failure instead of being silently skipped.

Usage: diffcheck.py SFDIR OUTDIR [QUERY[,QUERY...]]
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


def main(sfdir: str, outdir: str, only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    failures = 0
    present = set(n for n in os.listdir(outdir)
                  if os.path.isdir(os.path.join(outdir, n)))
    manifest = os.path.join(outdir, "attempted.json")
    if only:
        expected = set(only)
    elif os.path.exists(manifest):
        expected = set(json.load(open(manifest)))
    else:
        expected = set(oracles)
    for name in sorted(expected - present):
        print(f"{name:22s} MISSING (no output dir — Verify crashed?)")
        failures += 1
    for name in sorted(present):
        d = os.path.join(outdir, name)
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
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
