#!/usr/bin/env python3
"""Derive a deterministic sf1 dataset from the driver's sf0.1 tables.

The driver generates sf0.001/0.01/0.1 only; the sf1 correctness sweep
(VERDICT r7 item 3) needs one more decade. This script scales sf0.1 by
`factor` (default 10) WITHOUT inventing new distributions: each output
table is `factor` stacked copies of the source with

  - dense surrogate keys remapped per copy (key + i * (max_key + 1)),
    preserving every FK relationship copy-internally (customer/orders/
    lineitem/supplier/part/events.user_id join exactly as in the source);
  - key-embedding name columns (c_name, s_name) regenerated from the
    remapped key so names stay unique and consistent;
  - documents.text suffixed with " c<i>" per copy (n_chars recomputed):
    copies remain NEAR-duplicates of their siblings (the dedup family
    sees realistic 10-deep near-dup clusters) without becoming EXACT
    duplicates, which would collapse d01 and produce mass float ties;
  - embeddings perturbed by a small deterministic per-copy delta
    (i * 1e-3 * ((dim_index % 7) - 3), float32) so ANN/top-k queries see
    tight-but-distinct clusters instead of exact-tie distance ranks;
  - region/nation (true dimensions) copied unchanged, like TPC-H.

Everything is pure arithmetic on the driver's rows — no RNG — so the
output is bit-reproducible and both engines (Spark + DuckDB oracle)
read the same parquet. Usage:

  python3 scripts/make_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/testdata-sf1] [factor=10]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata-sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(DST, exist_ok=True)


def read(t):
    return pq.read_table(f"{SRC}/{t}.parquet")


def set_col(part, name, arr):
    i = part.schema.get_field_index(name)
    return part.set_column(i, part.schema.field(i), arr)


def scale(t, key_strides, transform=None):
    """Stack FACTOR copies; remap each col in key_strides by +i*stride."""
    tbl = read(t)
    schema = tbl.schema
    copies = []
    for i in range(FACTOR):
        cols = []
        for field in schema:
            col = tbl.column(field.name)
            if field.name in key_strides and i > 0:
                col = pc.cast(pc.add(col, key_strides[field.name] * i), field.type)
            cols.append(col.combine_chunks())
        part = pa.Table.from_arrays(cols, schema=schema)
        if transform is not None:
            part = transform(part, i)
        copies.append(part)
    full = pa.concat_tables(copies)
    pq.write_table(full, f"{DST}/{t}.parquet")
    print(f"{t}: {tbl.num_rows} -> {full.num_rows}")


def stride(t, key):
    """Dense keys: stride = max + 1 keeps copies disjoint and dense."""
    return pc.max(read(t).column(key)).as_py() + 1


N_CUST = stride("customer", "c_custkey")
N_SUPP = stride("supplier", "s_suppkey")
N_PART = stride("part", "p_partkey")
N_ORD = stride("orders", "o_orderkey")
N_EVT = stride("events", "event_id")
N_USER = stride("events", "user_id")
N_DOC = stride("documents", "doc_id")
N_VEC = stride("embeddings", "vec_id")

for t in ("region", "nation"):
    pq.write_table(read(t), f"{DST}/{t}.parquet")
    print(f"{t}: copied")


def regen_name(col_key, col_name, prefix):
    def tf(part, i):
        if i == 0:
            return part
        names = [f"{prefix}#{k:09d}" for k in part.column(col_key).to_pylist()]
        return set_col(part, col_name, pa.array(names, pa.string()))
    return tf


scale("customer", {"c_custkey": N_CUST},
      regen_name("c_custkey", "c_name", "Customer"))
scale("supplier", {"s_suppkey": N_SUPP},
      regen_name("s_suppkey", "s_name", "Supplier"))
scale("part", {"p_partkey": N_PART})
scale("orders", {"o_orderkey": N_ORD, "o_custkey": N_CUST})
scale("lineitem", {"l_orderkey": N_ORD, "l_partkey": N_PART, "l_suppkey": N_SUPP})
scale("events", {"event_id": N_EVT, "user_id": N_USER})


def doc_tf(part, i):
    if i == 0:
        return part
    texts = [f"{t} c{i}" for t in part.column("text").to_pylist()]
    part = set_col(part, "text", pa.array(texts, pa.string()))
    return set_col(part, "n_chars", pa.array([len(t) for t in texts], pa.int64()))


scale("documents", {"doc_id": N_DOC}, doc_tf)


def emb_tf(part, i):
    if i == 0:
        return part
    delta = (1e-3 * i * ((np.arange(64) % 7) - 3)).astype(np.float32)
    vecs = [(np.asarray(v, dtype=np.float32) + delta).tolist()
            for v in part.column("embedding").to_pylist()]
    return set_col(part, "embedding", pa.array(vecs, pa.list_(pa.float32())))


scale("embeddings", {"vec_id": N_VEC}, emb_tf)
print(f"done -> {DST}")
