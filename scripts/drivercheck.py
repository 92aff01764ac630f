#!/usr/bin/env python3
"""Driver-faithful correctness compare (stricter than selfcheck.py).

Usage: python3 scripts/drivercheck.py <sfDir> <verifyOutDir> [name...]

Mimics the driver's CORRECTNESS comparator exactly as observed:
  - Spark result: pandas.read_parquet of <outDir>/<name>/
  - oracle: DuckDB .df() over the same sf tables
  - columns sorted by name, then DataFrame.sort_values over ALL columns
    (this CRASHES on array/map columns — intentionally reproduced, the
    driver does too, so queries must emit scalar columns only)
  - rows_match / schema(name)_match / hash over dtype-sensitive values:
    int64 vs float64 with equal values is a MISMATCH, like the driver's
    value hash. Integer widths are normalized (int32 == int64), floats
    must be bit-identical.
"""
import json, sys
import numpy as np
import pandas as pd
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns, key=str.lower)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")  # crashes on arrays, like driver
    return df.reset_index(drop=True)


def kind(dt) -> str:
    if pd.api.types.is_bool_dtype(dt): return "bool"
    if pd.api.types.is_integer_dtype(dt): return "int"
    if pd.api.types.is_float_dtype(dt): return "float"
    if pd.api.types.is_datetime64_any_dtype(dt): return "ts"
    return "obj"


def col_equal(name, a: pd.Series, b: pd.Series):
    ka, kb = kind(a.dtype), kind(b.dtype)
    if ka != kb:
        return False, f"col {name}: dtype kind {a.dtype} vs {b.dtype}"
    if ka == "float":
        av, bv = a.to_numpy("f8"), b.to_numpy("f8")
        same = (av == bv) | (np.isnan(av) & np.isnan(bv))
        if not same.all():
            i = int(np.argmin(same))
            return False, f"col {name}: float bits differ row {i}: {av[i]!r} vs {bv[i]!r}"
        return True, None
    if ka == "int":
        av, bv = a.to_numpy("i8"), b.to_numpy("i8")
        if not (av == bv).all():
            i = int(np.argmin(av == bv))
            return False, f"col {name}: int differ row {i}: {av[i]} vs {bv[i]}"
        return True, None
    eq = a.reset_index(drop=True).eq(b.reset_index(drop=True)) | (a.isna().to_numpy() & b.isna().to_numpy())
    if not eq.all():
        i = int(np.argmin(eq.to_numpy()))
        return False, f"col {name}: differ row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}"
    return True, None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            exp = canon(con.sql(sql).df())
        except Exception as e:
            failed.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            continue
        if [c.lower() for c in got.columns] != [c.lower() for c in exp.columns]:
            failed.append(name)
            print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}")
            continue
        if len(got) != len(exp):
            failed.append(name)
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            continue
        bad = None
        for cg, ce in zip(got.columns, exp.columns):
            ok, msg = col_equal(cg, got[cg], exp[ce])
            if not ok:
                bad = msg
                break
        if bad:
            failed.append(name)
            print(f"FAIL {name}: {bad}")
        else:
            print(f"OK   {name}: {len(got)} rows")
    total = len(only) if only else len(oracle)
    print(f"\n{total - len(failed)}/{total} driver-exact")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
