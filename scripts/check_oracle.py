#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate: compare Verify output parquet
against DuckDB running SparkEntry.oracleSql on the same sf dir.

Usage: python3 scripts/check_oracle.py /tmp/verify_sf001 /root/testdata/sf0.01

STRICTNESS CONTRACT (r9, after both r8 reds shipped through a
too-tolerant mirror): this script must be AT LEAST as strict as the
driver's comparator. Two rules that encode that:
  1. Any gated query whose output contains a complex-typed column
     (array/map/struct -> ndarray/list/dict cells) FAILS here outright:
     the driver pandas-sort_values the whole frame and crashes on
     unhashable cells (r8 q176). Stringify such columns in the query
     (array_join) instead of gating the raw column.
  2. Floats hash at FULL precision (17 significant digits -- round-trip
     exact for float64). The old %.6g hash masked last-ulp window
     re-association drift that the driver catches (r8 q72d). A %.6g
     advisory hash is still computed: "full-precision mismatch but %.6g
     matches" pinpoints the fp-noise class vs a real value bug.
"""
import sys, os, json, glob, hashlib
import pandas as pd


def complex_cols(df: pd.DataFrame):
    """Columns whose cells the driver's sort_values cannot hash."""
    out = []
    for c in df.columns:
        col = df[c].dropna()
        if len(col) and any(
                isinstance(v, (list, dict, set)) or hasattr(v, "tolist")
                and not pd.api.types.is_scalar(v)
                for v in col.head(5)):
            out.append(c)
    return out


def canon(df: pd.DataFrame, float_fmt: str) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                cells.append("NULL")
            elif isinstance(v, float):
                cells.append(format(v, float_fmt))
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main(outdir, sfdir):
    import duckdb
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    ok, bad = [], []
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
        # Rule 1: complex-typed output columns crash the driver hasher.
        cc = complex_cols(spark_df)
        if cc:
            bad.append((name, f"complex-typed column(s) {cc}: driver sort_values "
                              f"will crash on unhashable cells -- stringify "
                              f"(array_join) in the gated query"))
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
        # float64). Flag dtype class mismatch here.
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
        # Rule 2: full-precision hash is the gate; %.6g is advisory only.
        if canon(spark_df, ".17g") != canon(duck_df, ".17g"):
            if canon(spark_df, ".6g") == canon(duck_df, ".6g"):
                bad.append((name, "HASH MISMATCH at full float precision "
                                  "(%.6g matches -- last-ulp fp drift class; "
                                  "use integer sufficient statistics)"))
            else:
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


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
