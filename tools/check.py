#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the raw tables in
<sfDir>, canonicalizes both (columns sorted by name, rows sorted by all
columns), and reports exact-match / diff per query.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; Spark-written scaled sets
        # (graft.tools.ScaleUp) are directories of part files
        import os
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.execute(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_fail += 1
                continue
            if g.equals(w):
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
            else:
                neq = (g != w) & ~(g.isna() & w.isna())
                bad_cols = [c for c in g.columns if neq[c].any()]
                print(f"FAIL {name}: value mismatch in {bad_cols}")
                for c in bad_cols[:3]:
                    idx = neq[c].idxmax()
                    print(f"  {c}[{idx}]: spark={g[c][idx]!r} oracle={w[c][idx]!r}")
                n_fail += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
