#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: read each
Verify-dumped parquet, run the matching oracle SQL in DuckDB over the same
sf tables, and compare (row count, column names, value hash) the way the
driver does (columns sorted by name).

Usage: check_oracles.py <verifyOutDir> <sfDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df) == 0:
        return df.reset_index(drop=True)
    # canonical row order: sort by all columns (stringified for mixed types)
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    import numpy as np
    df = df.iloc[np.argsort(key.to_numpy(), kind="stable")].reset_index(drop=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no parquet dumped"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"ERROR    {name}: {e}"); n_fail += 1; continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL     {name}: columns {list(s.columns)} vs {list(d.columns)}"); n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL     {name}: rows {len(s)} vs {len(d)}"); n_fail += 1; continue
        mism = []
        for c in s.columns:
            a, b = s[c], d[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np
                eq = (a.isna() & b.isna()) | (a == b)
                ok = bool(eq.all())
            else:
                ok = bool((a.astype(str) == b.astype(str)).all())
            if not ok:
                bad = (a.astype(str) != b.astype(str))
                i = bad[bad].index[0]
                mism.append(f"{c}[{i}]: {a[i]!r} vs {b[i]!r}")
        if mism:
            print(f"FAIL     {name}: {'; '.join(mism[:3])}"); n_fail += 1
        else:
            print(f"PASS     {name}: {len(s)} rows"); n_pass += 1
    # rows-only queries: just report counts
    for pdir in sorted(glob.glob(f"{out_dir}/q_*")):
        name = os.path.basename(pdir)
        if name in oracles: continue
        files = glob.glob(f"{pdir}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else -1
        print(f"ROWSONLY {name}: {n} rows")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
