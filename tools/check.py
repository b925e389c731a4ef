# Driver-side self-check (NOT library code): mimics the driver's
# correctness gate — run each oracle SQL in DuckDB on the sf tables,
# compare row count / schema (sorted column names) / value hash against
# the Verify parquet dump.
import duckdb, json, sys, glob, os
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    t = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize temporal columns to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

# Expected set comes from Verify's _meta.json (all declared queries) —
# NOT from the directories present: a query that crashed during Verify
# writes no dump and must count as red, not vanish from the denominator.
meta_path = os.path.join(out_dir, "_meta.json")
if os.path.exists(meta_path):
    meta = json.load(open(meta_path))
    expected = meta["queries"]
    crashed = meta.get("failed", {})
else:  # older dump: fall back to oracle keys + whatever dirs exist
    expected = sorted(set(oracle) | {n for n in os.listdir(out_dir)
                                     if os.path.isdir(os.path.join(out_dir, n))})
    crashed = {}

results = {}
for name in expected:
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        results[name] = "NO DUMP: " + crashed.get(name, "query produced no output dir")
        continue
    spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        results[name] = f"rows-only: {len(spark_df)} rows " + ("OK" if len(spark_df) > 0 else "EMPTY!")
        continue
    try:
        ora_df = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE SQL ERROR: {e}"
        continue
    a, b = canon(spark_df), canon(ora_df)
    if list(a.columns) != list(b.columns):
        results[name] = f"SCHEMA MISMATCH: spark={list(a.columns)} oracle={list(b.columns)}"
        continue
    if len(a) != len(b):
        results[name] = f"ROWCOUNT MISMATCH: spark={len(a)} oracle={len(b)}"
        continue
    try:
        eq = a.equals(b)
        if not eq:
            # find first differing cell for diagnostics
            diff = (a != b) & ~(a.isna() & b.isna())
            cells = diff.to_numpy().nonzero()
            i, j = cells[0][0], cells[1][0]
            results[name] = (f"VALUE MISMATCH at row {i} col {a.columns[j]}: "
                             f"spark={a.iloc[i, j]!r} oracle={b.iloc[i, j]!r}")
        else:
            results[name] = f"OK ({len(a)} rows)"
    except Exception as e:
        results[name] = f"COMPARE ERROR: {e}"

bad = 0
for k, v in results.items():
    flag = "" if v.startswith("OK") or v.startswith("rows-only") and "EMPTY" not in v else " <<<<"
    if flag: bad += 1
    print(f"{k:24s} {v}{flag}")
print(f"\n{len(results)-bad}/{len(results)} green")
