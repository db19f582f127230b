#!/usr/bin/env python3
"""Dev-loop parity checker mimicking the driver's DuckDB oracle compare:
run each oracle SQL against the sf parquet tables, load the Spark parquet
result, sort columns by name + sort rows, compare values.

Usage: python3 dev/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: timestamps → iso strings, floats → round
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "__len__") and not isinstance(v, (str, bytes)) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        rd = os.path.join(outdir, name)
        if not os.path.isdir(rd):
            continue
        got = pd.read_parquet(rd)
        if name not in oracle:
            print(f"{name:28s} ROWS-ONLY rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE-SQL-ERROR {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"{name:28s} COLS-MISMATCH spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"{name:28s} NROWS-MISMATCH spark={len(g)} duck={len(e)}")
            n_fail += 1
            continue
        # dtype report
        dt_diff = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns if str(g[c].dtype) != str(e[c].dtype)]
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
            flag = "PASS" if not dt_diff else f"PASS (dtype diff {dt_diff})"
            print(f"{name:28s} {flag}")
            n_pass += 1
        except AssertionError as ex:
            print(f"{name:28s} VALUES-MISMATCH {str(ex)[:300]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
