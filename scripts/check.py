#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables.

Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]

The driver sorts columns by name before hashing values; we do the same and
compare row-by-row in file order (our queries are totally ordered, so file
order must already match the oracle's ORDER BY).
"""
import sys, os, json, glob, math

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact — the driver hashes raw values, so any ulp drift must FAIL here
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, int):
        return v
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is a single file per table; ScaleUp output is a
        # Spark directory of part files — accept both layouts
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/part-*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        got_tbl = pq.read_table(files)  # all parts, sorted filename order
        try:
            exp = con.sql(sql)
            exp_cols = exp.columns
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got_cols = got_tbl.column_names
        if sorted(got_cols) != sorted(c.lower() for c in exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} vs oracle {sorted(exp_cols)}")
            n_fail += 1
            continue
        # sort columns by name (driver behavior)
        got_order = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        exp_order = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i].lower())
        gd = got_tbl.to_pylist()
        got_rows = [tuple(norm(r[got_cols[i]]) for i in got_order) for r in gd]
        exp_rows2 = [tuple(norm(r[i]) for i in exp_order) for r in exp_rows]
        if len(got_rows) != len(exp_rows2):
            print(f"FAIL {name}: rows {len(got_rows)} vs oracle {len(exp_rows2)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows2)):
            if g != e:
                bad = (i, g, e)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  got {bad[1]}\n  exp {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
