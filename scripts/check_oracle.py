#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (NOT part of the Scala
engine; dev tooling only). Runs graft.Verify output against DuckDB.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

For each <out_dir>/<name> parquet dir with an entry in oracle_sql.json:
run the SQL in DuckDB over the sf tables, compare as (column-name-sorted,
row-sorted) frames, print PASS/FAIL per query.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes that differ in representation only
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.execute(sql).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                raise AssertionError(f"columns {list(g.columns)} != {list(w.columns)}")
            if len(g) != len(w):
                raise AssertionError(f"rows {len(g)} != {len(w)}")
            sort_cols = list(g.columns)
            g = g.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
            w = w.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            msg = str(e).replace("\n", " | ")[:400]
            print(f"FAIL {name}: {msg}")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} passed")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
