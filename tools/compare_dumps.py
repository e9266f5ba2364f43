#!/usr/bin/env python3
"""Compare two graft.Verify dumps query-by-query, order-insensitively:
columns sorted by name, rows sorted by all columns, sha256 over the
CSV rendering — the driver's hash discipline applied between two dumps
(e.g. a fault-injected cluster run vs the no-fault reference).

Usage: compare_dumps.py <dumpA> <dumpB>
Exit 0 iff every query present in A is hash-identical in B.
"""
import glob
import hashlib
import os
import sys

import pandas as pd


def h(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()


def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sorted(os.path.basename(p) for p in glob.glob(a + "/q_*"))
    if not names:
        print(f"no query dumps under {a}")
        sys.exit(2)
    bad = []
    for n in names:
        pb = f"{b}/{n}"
        if not os.path.isdir(pb):
            bad.append((n, "missing"))
            print(f"[MISSING] {n}")
            continue
        da, db = pd.read_parquet(f"{a}/{n}"), pd.read_parquet(pb)
        ha, hb = h(da), h(db)
        ok = ha == hb
        if not ok:
            bad.append((n, "hash"))
        print(f"[{'EQUAL' if ok else 'DIFF'}] {n} rows={len(da)}/{len(db)}")
    print("ALL EQUAL" if not bad else f"MISMATCH: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
