#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name>/ parquet (Spark result) via pandas/pyarrow —
the driver's representation, NOT through DuckDB, which silently
normalizes DECIMAL->float64 and DATE->datetime64 (the round-1 trap) —
runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB
against the fixture tables in <sfDir>, sorts columns by name and rows by
all columns, and compares values exactly, INCLUDING cell types and
column dtypes: a Decimal vs float or date vs str difference is a FAIL
here because it is a hash-mismatch in the driver.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if type(a) is not type(b):
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a != a and b != b:  # NaT/NaN-like
            return True
    except Exception:
        pass
    return a == b


def compare(name, got, exp):
    if sorted(got.columns) != sorted(exp.columns):
        return f"COLUMNS differ: spark={sorted(got.columns)} oracle={sorted(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWCOUNT differ: spark={len(got)} oracle={len(exp)}"
    got, exp = canon(got), canon(exp)
    # dtype equality is a hard failure: the driver hashes representations.
    dt = {c: (str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
          if str(got[c].dtype) != str(exp[c].dtype)}
    if dt:
        return f"DTYPE differ: {dt}"
    for c in got.columns:
        ga, ea = got[c].tolist(), exp[c].tolist()
        for i, (a, b) in enumerate(zip(ga, ea)):
            if not cells_equal(a, b):
                return (f"VALUE differ col={c} row={i}: "
                        f"spark={a!r} ({type(a).__name__}) "
                        f"oracle={b!r} ({type(b).__name__})")
    return "OK"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    # a requested query that is absent from the dump must FAIL loudly,
    # not pass vacuously (a compile failure leaves a stale oracle json)
    for name in sorted(only - set(oracle)):
        print(f"[FAIL] {name}: not in oracle_sql.json (stale dump?)")
        failures += 1
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output")
            failures += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                            ignore_index=True)
            exp = con.execute(sql).fetchdf()
            res = compare(name, got, exp)
        except Exception as e:
            res = f"ERROR: {e}"
        ok = res.startswith("OK")
        failures += 0 if ok else 1
        print(f"[{'ok' if ok else 'FAIL'}] {name}: {res}")
    print(f"{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
