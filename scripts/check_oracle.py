#!/usr/bin/env python3
"""Local replay of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <out>/oracle_sql.json in DuckDB against views named
after the test tables, and compares: schema (column names sorted),
row count, and a hash of the value matrix with columns sorted by name
and rows sorted canonically.
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rep = df.apply(lambda c: c.map(cell_repr))
    rows = sorted(rep.itertuples(index=False, name=None))
    m = hashlib.sha256()
    for r in rows:
        m.update(("\x01".join(r) + "\n").encode())
    return m.hexdigest()


def cell_repr(v) -> str:
    if v is None or v != v:  # NaN/None
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
        name = res_dir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            status = "rows-only" + (" OK" if len(got) > 0 else " EMPTY!")
            print(f"---- {name}: no oracle ({status}, {len(got)} rows)")
            n_noracle += 1
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_rows = len(got) == len(want)
        ok_hash = ok_cols and ok_rows and canon(got) == canon(want)
        if ok_hash:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: cols={ok_cols} rows={ok_rows}({len(got)} vs {len(want)})")
            if ok_cols and ok_rows:
                g = got.reindex(sorted(got.columns), axis=1)
                w = want.reindex(sorted(want.columns), axis=1)
                grows = sorted(g.apply(lambda c: c.map(cell_repr)).itertuples(index=False, name=None))
                wrows = sorted(w.apply(lambda c: c.map(cell_repr)).itertuples(index=False, name=None))
                shown = 0
                for i, (a, b) in enumerate(zip(grows, wrows)):
                    if a != b and shown < 3:
                        print(f"  row {i}: got  {a}")
                        print(f"         want {b}")
                        shown += 1
            else:
                print(f"  got cols:  {sorted(got.columns)}")
                print(f"  want cols: {sorted(want.columns)}")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
