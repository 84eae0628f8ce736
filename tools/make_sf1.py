#!/usr/bin/env python3
"""Derive sf1.0-scale test parquet from the driver's sf0.1 tables, for
the at-scale oracle sweep (dev tooling only — the shipped library is
pure Scala/Spark).

Each fact/entity table is replicated REPS times with every key column
shifted by copy_index * OFFSET(table), where OFFSET is a shared power
of ten above the table's max key — so referential integrity holds by
construction (copy i of lineitem points at copy i of orders/part/
supplier, etc.) and the result is deterministic: no RNG, byte-stable
across runs. Schemas are preserved exactly via pyarrow (the loaders'
schema contract in TablesSpec keeps holding). nation/region are bounded
dimensions and stay as-is, like a real warehouse at 10x.

Usage: python3 tools/make_sf1.py [srcDir] [dstDir] [reps]
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "target/sf1.0"
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)


def offset_for(maxval: int) -> int:
    off = 10
    while off <= maxval:
        off *= 10
    return off


def load(t):
    return pq.read_table(f"{src}/{t}.parquet")


# shared offsets so FKs stay aligned across tables
offs = {}
for t, col in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
               ("part", "p_partkey"), ("orders", "o_orderkey"),
               ("events", "event_id"), ("events", "user_id"),
               ("documents", "doc_id"), ("embeddings", "vec_id")]:
    tab = load(t)
    m = pc.max(tab[col]).as_py()
    offs[col] = max(offs.get(col, 0), offset_for(m))

SHIFT = {
    "customer":   {"c_custkey": "c_custkey"},
    "supplier":   {"s_suppkey": "s_suppkey"},
    "part":       {"p_partkey": "p_partkey"},
    "orders":     {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem":   {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                   "l_suppkey": "s_suppkey"},
    "events":     {"event_id": "event_id", "user_id": "user_id"},
    "documents":  {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

for t in ["region", "nation"]:
    pq.write_table(load(t), f"{dst}/{t}.parquet")
    print(f"{t}: copied as-is")

for t, shifts in SHIFT.items():
    tab = load(t)
    copies = []
    for i in range(reps):
        if i == 0:
            copies.append(tab)
            continue
        cols = []
        for f in tab.schema:
            c = tab[f.name]
            if f.name in shifts:
                c = pc.cast(
                    pc.add(c, i * offs[shifts[f.name]]), f.type)
            cols.append(c)
        copies.append(pa.table(cols, schema=tab.schema))
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/{t}.parquet")
    print(f"{t}: {tab.num_rows} -> {out.num_rows} rows")
