#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads Verify output
parquet + oracle_sql.json, runs each oracle in DuckDB over the sfdir
tables, compares row counts, column names, and values."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d): continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet written"); fail += 1; continue
    tbl = pq.read_table(files[0])
    if name not in oracle:
        print(f"rows-only {name}: {tbl.num_rows} rows"); ok += 1; continue
    try:
        want = con.sql(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle error {str(e)[:120]}"); fail += 1; continue
    got_cols, want_cols = sorted(tbl.column_names), sorted(want.column_names)
    if got_cols != want_cols:
        print(f"FAIL {name}: columns {got_cols} != {want_cols}"); fail += 1; continue
    if tbl.num_rows != want.num_rows:
        print(f"FAIL {name}: rows {tbl.num_rows} != {want.num_rows}"); fail += 1; continue
    bad = None
    # Strict: repr() includes the Python type (Decimal vs int, aware vs
    # naive datetime), mimicking the driver's type-sensitive value hash.
    for c in got_cols:
        g = tbl.column(c).to_pylist()
        w = want.column(c).to_pylist()
        for i, (a, b) in enumerate(zip(g, w)):
            if repr(a) != repr(b):
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} duck={bad[3]!r}"); fail += 1
    else:
        print(f"OK   {name}: {tbl.num_rows} rows x {len(got_cols)} cols"); ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
