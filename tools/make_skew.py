#!/usr/bin/env python3
"""Build the ADVERSARIAL-SKEW twin of a replicated sf dir: identical
volume and text, but every document forced into ONE source and ONE
language — the mega-key stress (a crawler regression or a one-language
firehose) that turns per-key group sizes into the whole corpus. Paired
with make_scale10.py's uniform replica, wall-clock ratios between the
two dirs measure whether the caps/salting actually bound skew (ratio
~1 = skew-immune shape; a quadratic or single-reducer path shows up as
a blowup).

Usage: python3 tools/make_skew.py [base_x10_dir] [out_dir]
"""
import os
import sys

import duckdb

base = sys.argv[1] if len(sys.argv) > 1 else "target/sf_skew_u"
out = sys.argv[2] if len(sys.argv) > 2 else "target/sf_skew_1key"

con = duckdb.connect()
os.makedirs(out, exist_ok=True)

for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "embeddings"]:
    con.execute(f"COPY (SELECT * FROM '{base}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT parquet)")

# events via pyarrow (TIMESTAMP(NANOS) preservation, as make_scale10)
import pyarrow.parquet as pq
pq.write_table(pq.read_table(f"{base}/events.parquet"),
               f"{out}/events.parquet", version="2.6",
               coerce_timestamps=None)

con.execute(
    f"COPY (SELECT doc_id, text, 'megalang' AS lang, "
    f"'megasrc' AS source, n_chars FROM '{base}/documents.parquet') "
    f"TO '{out}/documents.parquet' (FORMAT parquet)")
n = con.execute(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
print(f"skewed documents: {n} rows, 1 source, 1 lang ->", out)
