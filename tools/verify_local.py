#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and diff. Usage:
  python3 tools/verify_local.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # dates / decimals / strings → canonical string
            df[c] = df[c].map(lambda v: None if v is None else str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def connect(sf_dir):
    con = duckdb.connect()
    # a temp_directory lets DuckDB SPILL big hash joins/group-bys instead
    # of dying with "Failed to allocate block" when the box is loaded —
    # the heavy shared-CTE oracles (minhash reach) hit that twice at
    # sf0.1 under co-tenant memory pressure
    con.sql("SET temp_directory='/tmp/duckdb_verify_spill'")
    con.sql("SET max_temp_directory_size='60GB'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = connect(sf_dir)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_run = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        # One long-lived connection accumulates DuckDB allocator state across a
        # 100+-query sf0.1 sweep until allocations fail; reconnect periodically.
        n_run += 1
        if n_run % 15 == 0:
            con.close()
            con = connect(sf_dir)
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_glob:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            exp = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns got={list(got.columns)} exp={list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}"); n_fail += 1; continue
        bad = []
        for c in got.columns:
            g, e = got[c], exp[c]
            if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(e):
                eq = (g.isna() & e.isna()) | (g == e)
                if not eq.all():
                    d = (g - e).abs().max()
                    bad.append(f"{c}: {int((~eq).sum())} diffs, maxabs={d}")
            else:
                ge = g.where(pd.notna(g), None); ee = e.where(pd.notna(e), None)
                if not ge.equals(ee):
                    neq = ~((g.isna() & e.isna()) | (g.astype(str) == e.astype(str)))
                    i = int(np.argmax(neq.values))
                    bad.append(f"{c}: {int(neq.sum())} diffs, first@{i}: got={g.iloc[i]!r} exp={e.iloc[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
