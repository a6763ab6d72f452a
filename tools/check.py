#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB against the same
parquet tables, loads the Spark result parquet written by graft.Verify,
and compares: row count, column names (sorted), and values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [queryName ...]
(with query names, only those entries are checked — pairs with a
graft.Verify run restricted to the same names)
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize value representations — datetimes only. Object columns
    # are deliberately NOT coerced (no tuple/str conversion): the driver
    # sorts raw dtypes, so a list/array-typed cell must crash the sort
    # here exactly as it crashes there (round-5 q_inverted_index).
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df


def num_kind(v):
    """Classify a scalar so int-vs-float representation differences FAIL.

    The driver hashes typed values: a DuckDB HUGEINT (window sum(INT))
    materializes as float64 while Spark emits int64, and the driver
    rejects it even when 0 == 0.0. This check must be at least as
    strict, or a local PASS can ship a driver FAIL (round-4
    q_pack_sequences)."""
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    return None


def dtype_class(dt):
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return "object"


def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    ka, kb = num_kind(a), num_kind(b)
    if ka is not None and kb is not None and ka != kb:
        return False  # int64 vs float64 etc. — the driver's hash differs
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: we engineered queries to be bit-identical
    return a == b


def frames_equal(a: pd.DataFrame, b: pd.DataFrame, ordered: bool):
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    if len(a) > 0:
        for c in a.columns:
            ca, cb = dtype_class(a[c].dtype), dtype_class(b[c].dtype)
            if ca != cb:
                return False, (f"dtype class mismatch col {c}: "
                               f"spark={a[c].dtype} vs oracle={b[c].dtype}")
    if not ordered:
        key_cols = list(a.columns)
        try:
            # The driver sorts every result frame by all columns on raw
            # dtypes before hashing; there is NO fallback. An output
            # whose cells pandas cannot factorize (arrays, structs) is a
            # driver-red row, so it must be a local FAIL too.
            a = a.sort_values(key_cols, kind="mergesort").reset_index(drop=True)
            b = b.sort_values(key_cols, kind="mergesort").reset_index(drop=True)
        except Exception as e:
            return False, ("DRIVER-SORT-INCOMPATIBLE: sort_values over raw "
                           f"dtypes failed ({type(e).__name__}: {e})")
    for i in range(len(a)):
        for c in a.columns:
            if not cell_eq(a[c].iat[i], b[c].iat[i]):
                return False, (f"row {i} col {c}: spark={a[c].iat[i]!r} "
                               f"oracle={b[c].iat[i]!r}")
    return True, "ok"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    only = set(sys.argv[3:])
    if only:
        unknown = only - oracle.keys()
        if unknown:
            # a typo'd name must not yield a vacuous 0-fail PASS
            sys.exit(f"unknown query name(s): {', '.join(sorted(unknown))}")
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = canon(pd.concat(
                [pd.read_parquet(f) for f in sorted(res_dir.glob("*.parquet"))],
                ignore_index=True))
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_fail += 1
            continue
        ok_uno, msg_uno = frames_equal(spark_df, duck_df, ordered=False)
        if not ok_uno and "DRIVER-SORT-INCOMPATIBLE" in msg_uno:
            # the driver's checker would crash on this output shape —
            # an ordered-comparison pass cannot rescue it
            print(f"FAIL {name}: {msg_uno}")
            n_fail += 1
            continue
        ok_ord, msg_ord = frames_equal(spark_df, duck_df, ordered=True)
        if ok_ord:
            print(f"PASS {name} ({len(spark_df)} rows, ordered)")
            n_pass += 1
        elif ok_uno:
            print(f"PASS {name} ({len(spark_df)} rows, UNORDERED ONLY — "
                  f"ordered mismatch: {msg_ord})")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg_uno}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
