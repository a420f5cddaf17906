#!/usr/bin/env python3
"""Whole-surface layout-independence check: compare two Verify output
dirs (e.g. runs at different SPARK_GRAFT_CPUS / partition counts) and
assert every query produced identical rows — the local proxy for
"results don't depend on cluster size".

Rows are compared order-insensitively with the driver's own canon:
columns sorted by name, every value stringified, rows sorted, then
hashed.

Usage: compare_runs.py <outDirA> <outDirB>
"""
import hashlib
import os
import sys

import duckdb


def canon_hash(con, path):
    rel = con.sql(
        f"SELECT * FROM read_parquet('{path}/*.parquet')")
    cols = sorted(rel.columns)
    # NULL canonicalizes to a \x00 sentinel (distinct from '') so every
    # fetched value is a sortable string
    sel = ", ".join(
        f"COALESCE(CAST(\"{c}\" AS VARCHAR), chr(0)) AS \"{c}\""
        for c in cols)
    rows = con.sql(
        f"SELECT {sel} FROM read_parquet('{path}/*.parquet')").fetchall()
    h = hashlib.sha256()
    for row in sorted(rows):
        h.update(("\x1f".join(row) + "\x1e").encode("utf-8"))
    return len(rows), h.hexdigest()


def main():
    a, b = sys.argv[1], sys.argv[2]
    def dirs(base):
        return {d for d in os.listdir(base)
                if os.path.isdir(os.path.join(base, d))}
    da, db = dirs(a), dirs(b)
    # symmetric: a query present in only ONE run is a failure either way
    # (a subset run compared against a full one is not layout evidence)
    if da != db:
        print(f"FAIL: query sets differ — only in {a}: {sorted(da - db)}; "
              f"only in {b}: {sorted(db - da)}")
        sys.exit(1)
    queries = sorted(da)
    con = duckdb.connect()
    n_pass = n_fail = 0
    for q in queries:
        na, ha = canon_hash(con, os.path.join(a, q))
        nb, hb = canon_hash(con, os.path.join(b, q))
        if (na, ha) == (nb, hb):
            n_pass += 1
        else:
            n_fail += 1
            print(f"MISMATCH {q}: {na} rows/{ha[:12]} vs {nb} rows/{hb[:12]}")
    print(f"== layout-independence: {n_pass} identical, {n_fail} mismatched "
          f"of {len(queries)} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
