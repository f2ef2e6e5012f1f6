#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [--strict]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the same
parquet tables, and compares values column-name-sorted, row-sorted.

--strict additionally mirrors the *driver's* pandas-based hasher, which is
stricter than the loose value compare: the Spark side is read with
pandas.read_parquet (pyarrow), the oracle side with fetchdf(), each frame is
column-name-sorted then row-sorted with DataFrame.sort_values (this is the
step that raises `unhashable type: numpy.ndarray` on array-typed cells,
exactly as the driver does), and cell values are string-rendered with no
rounding and hashed. Physical-representation divergences that the loose mode
normalizes away (decimal(28,s) vs decimal(38,s) sums, INT96/ns vs us
timestamps) show up here as value-render or sort dtype mismatches. A query
is only claimed green when BOTH modes pass.
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

def strict_frame(df):
    """Canonicalize a pandas frame the way the driver's hasher does: columns
    sorted by name, rows sorted by every column (raises TypeError on
    unhashable cells like numpy arrays — deliberately not caught here), cells
    rendered to strings with full precision."""
    import pandas as pd
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)

    import datetime, decimal

    def render(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # float(v): numpy float64 passes isinstance(float) but its repr
            # is 'np.float64(x)' under numpy>=2 — force the builtin
            return repr(float(v) + 0.0)  # full precision, -0.0 collapsed
        # DECIMAL cells surface as decimal.Decimal via pyarrow but as float64
        # via duckdb fetchdf — scale-padded trailing zeros ('288827.2470' vs
        # '288827.247') are representation, not value (driver hashes decimal
        # outputs green, e.g. q02/q10 round 1); render both as floats
        if isinstance(v, decimal.Decimal):
            return repr(float(v) + 0.0)
        # DATE columns surface as datetime.date via pyarrow but as midnight
        # datetime64 via duckdb fetchdf — same value, render identically
        # (the driver hashes DATE outputs green, e.g. q25 round 1).
        if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
            return f"{v} 00:00:00"
        return str(v)

    return [tuple(render(v) for v in row) for row in df.itertuples(index=False)]

def strict_check(con, name, sql, out_dir):
    """Returns None if strict-equal, else a failure description."""
    import pandas as pd
    try:
        g = pd.read_parquet(f"{out_dir}/{name}")  # pyarrow, like the driver
    except Exception as e:
        return f"spark read error: {e}"
    try:
        e_df = con.execute(sql).fetchdf()
    except Exception as e:
        return f"oracle exec error: {e}"
    if sorted(g.columns) != sorted(e_df.columns):
        return f"cols spark={sorted(g.columns)} duckdb={sorted(e_df.columns)}"
    try:
        gr = strict_frame(g)
    except TypeError as e:
        return f"spark frame unhashable (driver would err): {e}"
    try:
        er = strict_frame(e_df)
    except TypeError as e:
        return f"oracle frame unhashable: {e}"
    if len(gr) != len(er):
        return f"row count {len(gr)} vs {len(er)}"
    for i, (a, b) in enumerate(zip(gr, er)):
        if a != b:
            return f"first diff at row {i}:\n   spark : {a}\n   duckdb: {b}"
    return None

def main(sf_dir, out_dir, strict=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = [a.split("=", 1)[1] for a in sys.argv[3:] if a.startswith("--only=")]
    if only:
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in only)}
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
        elif strict:
            why = strict_check(con, name, sql, out_dir)
            if why is None:
                n_ok += 1
                print(f"ok   {name} ({len(gr)} rows, strict)")
            else:
                n_bad += 1
                print(f"FAIL {name} [strict]: {why}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(gr)} rows)")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], "--strict" in sys.argv[3:]))
