#!/usr/bin/env python3
"""Local correctness loop: mimic the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads each <out>/<name>/ parquet (Spark result) and runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sfDir tables;
compares row count, column names (sorted), and values.
"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(out)):
    d = f"{out}/{name}"
    if not os.path.isdir(d): continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"!! {name}: NO SPARK OUTPUT"); fail += 1; continue
    srel = con.sql(f"SELECT * FROM '{files[0]}'")
    sdf = srel.df()
    if name not in oracle:
        print(f"-- {name}: no oracle ({len(sdf)} rows, cols={list(sdf.columns)})"); continue
    try:
        orel = con.sql(oracle[name])
        odf = orel.df()
    except Exception as e:
        print(f"!! {name}: ORACLE SQL ERROR: {e}"); fail += 1; continue
    stypes = dict(zip(srel.columns, [str(t) for t in srel.types]))
    otypes = dict(zip(orel.columns, [str(t) for t in orel.types]))
    sdf = sdf[sorted(sdf.columns)]; odf = odf[sorted(odf.columns)]
    if list(sdf.columns) != list(odf.columns):
        print(f"!! {name}: SCHEMA cols spark={list(sdf.columns)} oracle={list(odf.columns)}"); fail += 1; continue
    def _norm(t):
        # tz-ness of timestamps is a parquet-metadata artifact of the
        # Spark writer, not a query-semantics drift; everything else
        # (esp. DECIMAL vs DOUBLE) must match exactly.
        return "TIMESTAMP" if t.startswith("TIMESTAMP") else t
    dt = [(c, stypes[c], otypes[c]) for c in sdf.columns
          if _norm(stypes[c]) != _norm(otypes[c])]
    if dt:
        # Type drift is a FAILURE, and it must be checked at the DuckDB
        # relation level: pandas .df() float-coerces decimals, so a Spark
        # DECIMAL vs DuckDB DOUBLE drift compares value-equal in pandas
        # while the driver's representation hash flags it red (this is
        # exactly how sql_q6_revenue_scan shipped red in round 6).
        # GRAFT_DTYPE_WARN=1 downgrades for exploratory runs.
        if os.environ.get("GRAFT_DTYPE_WARN") == "1":
            print(f"?? {name}: TYPES differ (warn): {dt}")
        else:
            print(f"!! {name}: TYPES differ: {dt}"); fail += 1; continue
    if len(sdf) != len(odf):
        print(f"!! {name}: ROWS spark={len(sdf)} oracle={len(odf)}"); fail += 1; continue
    bad = []
    for c in sdf.columns:
        a, b = sdf[c].tolist(), odf[c].tolist()
        if a != b:
            diffs = [(i, a[i], b[i]) for i in range(len(a)) if a[i] != b[i] and not (a[i] is None and b[i] is None) and str(a[i]) != str(b[i])][:3]
            if diffs: bad.append((c, diffs))
    if bad:
        fail += 1
        print(f"!! {name}: VALUES differ:")
        for c, diffs in bad:
            for i, x, y in diffs: print(f"     col={c} row={i} spark={x!r} oracle={y!r}")
    else:
        print(f"ok {name}: {len(sdf)} rows")
print(f"\n{'FAIL' if fail else 'PASS'} ({fail} failing)")
sys.exit(1 if fail else 0)
