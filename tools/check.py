#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB against the fixture
tables in <sfDir>, sorts columns by name and rows by all columns, and
compares values exactly. This is intentionally STRICTER than any sane
harness (bit-exact on floats) — if this passes, the driver's compare
passes.
"""
import sys, json, glob, math
import duckdb

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
    for c in got.columns:
        ga, ea = got[c].tolist(), exp[c].tolist()
        for i, (a, b) in enumerate(zip(ga, ea)):
            if not cells_equal(a, b):
                return (f"VALUE differ col={c} row={i}: "
                        f"spark={a!r} ({type(a).__name__}) "
                        f"oracle={b!r} ({type(b).__name__})")
    # dtype report (informational)
    dt = {c: (str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
          if str(got[c].dtype) != str(exp[c].dtype)}
    return ("OK" if not dt else f"OK (dtype notes: {dt})")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
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
