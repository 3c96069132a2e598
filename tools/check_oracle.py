#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: run each
oracle SQL in DuckDB over the sf parquet tables, load the Verify
parquet dump, sort columns by name + rows, and compare values."""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
# defaults are tuned for the sf0.01 gate; scaled re-checks (sfx10)
# need headroom before DuckDB starts spilling to .tmp
con.execute("SET memory_limit='48GB'")
con.execute("SET temp_directory='/tmp/duckdb_spill'")
for t in TABLES:
    # driver testdata ships single-file tables; ScaleUp-materialized
    # dirs (e.g. /tmp/sfx10) are Spark-written directories of parts
    p = f"{sfdir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    if t == "events":
        # ScaleUp replicas ship ts as raw epoch-nanos BIGINT (the
        # engine reads either width via Tables.events.deriveTsNs);
        # give the oracle SQL the same TIMESTAMP view it gets on
        # driver testdata. Nanos came from micros*1000, so //1000
        # is lossless.
        (ts_type,) = con.execute(
            "SELECT typeof(ts) FROM events LIMIT 1").fetchone()
        if ts_type == "BIGINT":
            con.execute("DROP VIEW events")
            con.execute(
                f"CREATE VIEW events AS SELECT * REPLACE"
                f" (make_timestamp(ts // 1000) AS ts) FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); fail += 1; continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in files])
    # driver-style normalize: columns sorted by name, then row-sort
    o = odf[sorted(odf.columns)].reset_index(drop=True)
    s = sdf[sorted(sdf.columns)].reset_index(drop=True)
    if list(o.columns) != list(s.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs oracle {list(o.columns)}"); fail += 1; continue
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    if len(o) != len(s):
        print(f"FAIL {name}: rows {len(s)} vs oracle {len(o)}"); fail += 1; continue
    # normalize only the pandas nullable-int spelling (Int64 -> int64 when
    # no nulls); everything else must match dtype-exactly, like the driver's
    # dtype-sensitive hash (DuckDB HUGEINT/DOUBLE drift must FAIL here).
    for df in (o, s):
        for c in df.columns:
            dt = str(df[c].dtype)
            if dt in ("Int64", "Int32") and not df[c].isna().any():
                df[c] = df[c].astype("int64")
            elif dt == "int32":
                df[c] = df[c].astype("int64")
            elif dt == "Float64" and not df[c].isna().any():
                df[c] = df[c].astype("float64")
    dmis = [(c, str(o[c].dtype), str(s[c].dtype)) for c in o.columns
            if str(o[c].dtype) != str(s[c].dtype)]
    if dmis:
        print(f"FAIL {name}: dtype drift {dmis}"); fail += 1; continue
    try:
        pd.testing.assert_frame_equal(o, s, check_dtype=True, check_exact=True)
        print(f"OK   {name}: {len(s)} rows"); ok += 1
    except AssertionError as e:
        print(f"FAIL {name}: value mismatch: {str(e)[:400]}"); fail += 1
print(f"\n{ok} ok, {fail} fail, {len([q for q in glob.glob(outdir+'/q*') ])} spark outputs total")
