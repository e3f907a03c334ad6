#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate: run each oracle
SQL in DuckDB over the sf tables, compare against the Spark parquet output
(columns sorted by name, rows sorted by all columns, exact value match with
a float near-miss report)."""
import json, sys, math
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    try:
        rel = con.sql(sql)
        # The driver's hasher serializes the DuckDB value verbatim, so a
        # HUGEINT (e.g. bare SUM(BIGINT)) hash-mismatches Spark's int64 even
        # though the pandas coercion below hides it. Catch it here.
        wide = [c for c, t in zip(rel.columns, rel.types)
                if str(t).upper() in ("HUGEINT", "UHUGEINT", "UBIGINT")]
        if wide:
            print(f"FAIL {name}: oracle emits non-int64 integer cols {wide} "
                  f"(wrap in CAST(... AS BIGINT))")
            fails.append(name); continue
        exp = rel.df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails.append(name); continue
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}"); fails.append(name); continue
    if sorted(exp.columns) != sorted(got.columns):
        print(f"FAIL {name}: columns exp={sorted(exp.columns)} got={sorted(got.columns)}")
        fails.append(name); continue
    e2, g2 = norm(exp), norm(got)
    if len(e2) != len(g2):
        print(f"FAIL {name}: rows exp={len(e2)} got={len(g2)}"); fails.append(name); continue
    bad = None
    for c in e2.columns:
        ev, gv = e2[c], g2[c]
        if ev.dtype.kind == 'f' or gv.dtype.kind == 'f':
            diff = (ev.astype(float) - gv.astype(float)).abs()
            mism = ~((ev.isna() & gv.isna()) | (diff.fillna(math.inf) == 0.0))
            if mism.any():
                i = mism.idxmax()
                near = diff[mism].max()
                bad = f"col {c}: {int(mism.sum())} mismatches, max|diff|={near} e.g. exp={ev[i]} got={gv[i]}"
                break
        else:
            mism = ~((ev.isna() & gv.isna()) | (ev == gv))
            if mism.any():
                i = mism.idxmax()
                bad = f"col {c}: {int(mism.sum())} mismatches e.g. exp={ev[i]!r} got={gv[i]!r}"
                break
    if bad:
        print(f"FAIL {name}: {bad}"); fails.append(name)
    else:
        print(f"OK   {name} ({len(e2)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} OK")
sys.exit(1 if fails else 0)
