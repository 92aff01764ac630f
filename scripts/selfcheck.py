#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the same sf tables, and
compares: schema (column names sorted), row count, and values (exact for
non-floats, 1e-9 relative for floats). Exits nonzero on any mismatch.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            if a == b:
                return True
            return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
        return float(a) == float(b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(eq(a[k], b[k]) for k in a)
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = got.columns
            got_rows = got.fetchall()
            exp = con.sql(sql)
            exp_cols = exp.columns
            exp_rows = exp.fetchall()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: exception {e}")
            continue
        if sorted(c.lower() for c in got_cols) != sorted(c.lower() for c in exp_cols):
            failed.append(name)
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            continue
        if len(got_rows) != len(exp_rows):
            failed.append(name)
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            continue
        # align column order by sorted name
        gi = [got_cols.index(c) for c in sorted(got_cols, key=str.lower)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols, key=str.lower)]
        bad = 0
        exact = True
        for r, (g, x) in enumerate(zip(got_rows, exp_rows)):
            ga = [g[i] for i in gi]
            xa = [x[i] for i in ei]
            if ga != xa:
                exact = False
            if not eq(ga, xa):
                bad += 1
                if bad <= 3:
                    print(f"  {name} row {r}: {ga} != {xa}")
        if bad:
            failed.append(name)
            print(f"FAIL {name}: {bad}/{len(got_rows)} rows differ")
        else:
            tag = "OK  " if exact else "OK~ "  # OK~ = float-tolerance only
            print(f"{tag}{name}: {len(got_rows)} rows")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries pass")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
