#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle comparison.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each <sfDir>/*.parquet as a
DuckDB view, runs every oracle query, and compares against the Spark result
parquet in <verifyOutDir>/<name>/. Columns are sorted by name and rows by
all columns before comparison (the strictest plausible driver behavior).
"""
import json
import sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                hasattr(v, "__len__") and not isinstance(v, (str, bytes)) else v)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            expected = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        eN, gN = normalize(expected), normalize(got)
        if list(eN.columns) != list(gN.columns):
            print(f"FAIL {name}: columns {list(gN.columns)} != {list(eN.columns)}")
            n_fail += 1
            continue
        if len(eN) != len(gN):
            print(f"FAIL {name}: rows {len(gN)} != {len(eN)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(eN, gN, check_dtype=False,
                                          check_exact=False, rtol=1e-6, atol=1e-6)
            print(f"PASS {name} ({len(gN)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else 'mismatch'}")
            diff = (eN != gN)
            bad_cols = [c for c in eN.columns if diff[c].any()]
            for c in bad_cols[:3]:
                idx = diff[c].idxmax()
                print(f"   col={c} row={idx} expected={eN[c][idx]!r} got={gN[c][idx]!r}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
