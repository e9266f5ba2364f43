#!/usr/bin/env python3
"""Build a 10x replica of an sf dir for scale-behavior experiments.

Facts (lineitem+orders share an orderkey offset so the bucketed join
stays consistent; events/documents/embeddings get id offsets) are
replicated REP times; dimension tables are copied as-is — so per-key
densities grow 10x, which is exactly the stress a scale-up applies.
Document text gets a per-replica suffix token: replicas become
NEAR-duplicates (the realistic dup-heavy corpus) instead of byte
clones. Output goes under target/ (never the read-only testdata).

Usage: python3 tools/make_scale10.py [src_sf_dir] [out_dir] [rep]
"""
import sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "target/sf_x10"
rep = int(sys.argv[3]) if len(sys.argv) > 3 else 10

OFF = 10_000_000  # key offset between replicas; far above any real key

con = duckdb.connect()
import os
os.makedirs(out, exist_ok=True)


def gen(table, select_i):
    parts = " UNION ALL ".join(select_i(i) for i in range(rep))
    con.execute(f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT parquet)")
    n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


def copy(table):
    con.execute(f"COPY (SELECT * FROM '{src}/{table}.parquet') "
                f"TO '{out}/{table}.parquet' (FORMAT parquet)")
    print(f"{table}: copied")


for t in ["region", "nation", "customer", "supplier", "part"]:
    copy(t)

gen("orders", lambda i:
    f"SELECT o_orderkey + {i * OFF} AS o_orderkey, "
    f"o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
    f"FROM '{src}/orders.parquet'")
gen("lineitem", lambda i:
    f"SELECT l_orderkey + {i * OFF} AS l_orderkey, l_partkey, l_suppkey, "
    f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    f"l_returnflag, l_linestatus, l_shipdate "
    f"FROM '{src}/lineitem.parquet'")
# events goes through pyarrow, not DuckDB: the fixture stores
# TIMESTAMP(NANOS) and the Spark-side reader requires that physical
# type (DuckDB COPY would silently downcast to micros)
import pyarrow as pa
import pyarrow.parquet as pq
_ev = pq.read_table(f"{src}/events.parquet")
_parts = []
for i in range(rep):
    _parts.append(_ev.set_column(
        0, "event_id",
        pa.compute.add(_ev.column("event_id"), i * OFF)))
pq.write_table(pa.concat_tables(_parts), f"{out}/events.parquet",
               version="2.6", coerce_timestamps=None)
print(f"events: {sum(len(p) for p in _parts)} rows (ns preserved)")
gen("documents", lambda i:
    f"SELECT doc_id + {i * OFF} AS doc_id, "
    f"text || ' clone{i}' AS text, lang, source, "
    f"n_chars + {len(f' clone{i}')} AS n_chars "
    f"FROM '{src}/documents.parquet'")
gen("embeddings", lambda i:
    f"SELECT vec_id + {i * OFF} AS vec_id, embedding, label "
    f"FROM '{src}/embeddings.parquet'")
print("done ->", out)
