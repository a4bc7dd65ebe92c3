#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: compare Verify.scala's
parquet dumps against DuckDB runs of oracle_sql.json over the same tables.

Usage: python3 tools/local_verify.py [sfdir] [outdir]
"""
import sys, os, json, glob
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"[MISS] {name}: no spark output"); fail += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
        gcols = [d[0] for d in con.description]
        want = con.execute(sql).fetchall()
        wcols = [d[0] for d in con.description]
    except Exception as e:
        print(f"[ERR ] {name}: {e}"); fail += 1; continue
    # sort columns by name (driver behavior), rows as returned
    gi = sorted(range(len(gcols)), key=lambda i: gcols[i])
    wi = sorted(range(len(wcols)), key=lambda i: wcols[i])
    g = [tuple(r[i] for i in gi) for r in got]
    w = [tuple(r[i] for i in wi) for r in want]
    if sorted(gcols) != sorted(wcols):
        print(f"[FAIL] {name}: cols spark={sorted(gcols)} duck={sorted(wcols)}"); fail += 1; continue
    if len(g) != len(w):
        print(f"[FAIL] {name}: rows spark={len(g)} duck={len(w)}"); fail += 1; continue
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
    if bad:
        i, a, b = bad[0]
        print(f"[FAIL] {name}: {len(bad)}/{len(g)} rows differ; first@{i}:")
        print(f"   spark={a}\n   duck ={b}")
        fail += 1
        continue
    # dtype gate: the driver hashes pandas frames, where value-equal but
    # dtype-different columns (e.g. DuckDB floor()->DOUBLE vs Spark
    # floor()->LONG) hash-differ even though tuple compare passes
    # (the r2 q_date_math_funcs red row). Compare pandas dtypes per column.
    try:
        import pandas as _pd
        sdf = _pd.read_parquet(os.path.dirname(files[0]))
        odf = con.execute(sql).df()
        def _date_equiv(a, b):
            # Spark DATE loads as object-of-datetime.date, DuckDB as
            # datetime64 — the driver's gate treats these as equal
            # (q_date_arith green in CORRECTNESS_r03/r04); mirror that.
            import datetime as _dt
            for x, y in ((a, b), (b, a)):
                if str(y.dtype).startswith("datetime64") and x.dtype == object:
                    nn = x.dropna()
                    if len(nn) and all(isinstance(v, (_dt.date, _dt.datetime))
                                       for v in nn.head(5)):
                        return True
            return False
        dbad = [(c, str(sdf[c].dtype), str(odf[c].dtype)) for c in sdf.columns
                if c in odf.columns and str(sdf[c].dtype) != str(odf[c].dtype)
                and not _date_equiv(sdf[c], odf[c])]
        if dbad:
            print(f"[FAIL] {name}: dtype mismatch (spark,duck): {dbad}")
            fail += 1
            continue
    except Exception as e:
        print(f"[WARN] {name}: dtype check skipped: {e!r}")
    print(f"[OK  ] {name}: {len(g)} rows")
# queries with no oracle: rows-only
for d in sorted(glob.glob(f"{outdir}/q_*")):
    name = os.path.basename(d)
    if name in oracle: continue
    files = glob.glob(f"{d}/*.parquet")
    n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
    print(f"[{'OK  ' if n > 0 else 'FAIL'}] {name}: rows-only check, {n} rows")
    if n == 0: fail += 1

# driver-loader hazard: the driver loads every output (oracle or not) with
# pandas and sorts/hashes it — ndarray cells (ANY list/struct column) crash
# that gate (CORRECTNESS_r01), and exotic dtypes can too. Run the actual
# pandas load + sort_values + hash here so the regression is caught locally
# before a round is burned.
import pandas as pd
for d in sorted(glob.glob(f"{outdir}/q*")):
    if not os.path.isdir(d): continue
    name = os.path.basename(d)
    try:
        df = pd.read_parquet(d)
        df.sort_values(by=list(df.columns), inplace=True)
        pd.util.hash_pandas_object(df.reset_index(drop=True))
    except Exception as e:
        print(f"[FAIL] {name}: pandas load/sort/hash raised: {e!r}")
        fail += 1
sys.exit(1 if fail else 0)
