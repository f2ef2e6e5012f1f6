#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the same
parquet tables, and compares values column-name-sorted, row-sorted.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / +0.0 and fp noise below round() granularity
        return round(v + 0.0, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(str(x) for x in r))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
            exp = con.execute(sql)
            e_cols = [d[0] for d in exp.description]
            e_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_bad += 1
            continue
        gc, gr = canon(g_rows, g_cols)
        ec, er = canon(e_rows, e_cols)
        if gc != ec:
            print(f"FAIL {name}: cols spark={gc} duckdb={ec}")
            n_bad += 1
        elif gr != er:
            n_bad += 1
            diffs = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b]
            print(f"FAIL {name}: {len(gr)} vs {len(er)} rows, "
                  f"first diffs {diffs[:3]}")
            for i in diffs[:3]:
                print(f"   spark : {gr[i]}")
                print(f"   duckdb: {er[i]}")
            if len(gr) != len(er):
                print(f"   spark[0:2]={gr[:2]} duckdb[0:2]={er[:2]}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(gr)} rows)")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
