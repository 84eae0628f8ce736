#!/usr/bin/env python3
"""Derive an sf3.0-scale corpus (3x sf1.0, 30x sf0.1) for the SECOND
decade of pair-family scale evidence (dev tooling only).

Plain replication (make_sf1.py) duplicates text VERBATIM, so clone
sets grow with reps and near-dup pair OUTPUT grows quadratically
(C(30,2)/C(10,2) = 9.7x at 3x data) — that measures the synthetic
data's output growth, not the engine. This script keeps outputs
~linear in the scale-up so walls measure the ENGINE:

- documents.text gets a per-copy token TRANSFORM — copy 0 identity,
  copy 1 reversed token order, copy 2 odd-then-even interleave. All
  three preserve token multisets and lengths (token-count / quality /
  exact-dedup profiles identical across copies) but share almost no
  k>=2 shingles, so clone sets stay size 10 WITHIN a copy and
  near-dup pairs scale ~3x. (Docs of <= 2 tokens can still collide
  across copies — rare and harmless for timing.)
- part.p_size/p_retailprice get a per-copy additive offset, so q164's
  2-of-3-field linkage blocking never pairs rows across copies
  (cross-copy rows agree only on p_type) while within-copy behavior
  is bit-identical to sf1.0.
- Every key column is shifted per copy exactly like make_sf1.py, so
  referential integrity holds by construction.

Usage: python3 tools/make_sf3.py [srcDir=target/sf1.0] [dstDir=target/sf3.0] [reps=3]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "target/sf1.0"
dst = sys.argv[2] if len(sys.argv) > 2 else "target/sf3.0"
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

os.makedirs(dst, exist_ok=True)


def offset_for(maxval: int) -> int:
    off = 10
    while off <= maxval:
        off *= 10
    return off


def load(t):
    return pq.read_table(f"{src}/{t}.parquet")


def transform_text(text: str, copy: int) -> str:
    if copy % 3 == 0 or text is None:
        return text
    toks = [t for t in text.split(" ") if t]
    if copy % 3 == 1:
        toks = toks[::-1]
    else:
        toks = toks[1::2] + toks[0::2]
    return " ".join(toks)


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
        cols = []
        for f in tab.schema:
            c = tab[f.name]
            if f.name in shifts and i > 0:
                c = pc.cast(pc.add(c, i * offs[shifts[f.name]]), f.type)
            elif t == "documents" and f.name == "text" and i > 0:
                c = pa.chunked_array([pa.array(
                    [transform_text(v, i) for v in c.to_pylist()],
                    type=f.type)])
            elif t == "part" and f.name == "p_size" and i > 0:
                c = pc.cast(pc.add(c, i * 1000), f.type)
            elif t == "part" and f.name == "p_retailprice" and i > 0:
                c = pc.cast(pc.add(c, i * 100000), f.type)
            cols.append(c)
        copies.append(pa.table(cols, schema=tab.schema))
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/{t}.parquet")
    print(f"{t}: {tab.num_rows} -> {out.num_rows} rows")
