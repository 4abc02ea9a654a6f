#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate: compare Verify output parquet
against DuckDB running SparkEntry.oracleSql on the same sf dir.

Usage: python3 scripts/check_oracle.py /tmp/verify_sf001 /root/testdata/sf0.01
Mirrors the driver: sort columns by name, sort rows, hash values
(floats rounded to 6 sig places to absorb fp noise).
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
with open(os.path.join(outdir, "oracle_sql.json")) as f:
    oracles = json.load(f)

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                cells.append("NULL")
            elif isinstance(v, float):
                cells.append(f"{v:.6g}")
            elif hasattr(v, "tolist"):  # numpy arrays / lists
                cells.append(json.dumps([f"{x:.6g}" if isinstance(x, float) else str(x) for x in v.tolist()]))
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


ok, bad, skipped = [], [], []
for name in sorted(oracles):
    qdir = os.path.join(outdir, name)
    if not os.path.isdir(qdir):
        bad.append((name, "NO SPARK OUTPUT"))
        continue
    try:
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in glob.glob(os.path.join(qdir, "*.parquet"))],
            ignore_index=True)
    except Exception as e:
        bad.append((name, f"spark read: {e}"))
        continue
    try:
        duck_df = con.execute(oracles[name]).df()
    except Exception as e:
        bad.append((name, f"duckdb: {e}"))
        continue
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        bad.append((name, f"schema: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"))
        continue
    # int-vs-float dtype skew: the driver's hasher stringifies 956 vs
    # 956.0 differently (bit us in r1 q04: DuckDB SUM(int)→HUGEINT→
    # float64). %.6g below masks it, so flag dtype class mismatch here.
    skew = [c for c in spark_df.columns
            if (pd.api.types.is_integer_dtype(spark_df[c].dtype)
                != pd.api.types.is_integer_dtype(duck_df[c].dtype))
            and (pd.api.types.is_numeric_dtype(spark_df[c].dtype)
                 and pd.api.types.is_numeric_dtype(duck_df[c].dtype))]
    if skew:
        bad.append((name, f"int/float dtype skew: {[(c, str(spark_df[c].dtype), str(duck_df[c].dtype)) for c in skew]}"))
        continue
    if len(spark_df) != len(duck_df):
        bad.append((name, f"rows: spark={len(spark_df)} duck={len(duck_df)}"))
        continue
    if canon(spark_df) != canon(duck_df):
        bad.append((name, "HASH MISMATCH"))
        continue
    ok.append(name)

no_oracle = [os.path.basename(d) for d in glob.glob(os.path.join(outdir, "q*"))
             if os.path.isdir(d) and os.path.basename(d) not in oracles]
print(f"OK: {len(ok)}  BAD: {len(bad)}  rows-only (no oracle): {len(no_oracle)}")
for n, why in bad:
    print(f"  FAIL {n}: {why}")
if no_oracle:
    print("  rows-only:", " ".join(sorted(no_oracle)))
sys.exit(1 if bad else 0)
