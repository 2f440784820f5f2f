#!/usr/bin/env python
"""Generate an sf1 fixture (~10x sf0.1) by key-shifted replication.

Round-5 verdict item 6: one more decade of scale exercises
accumulation-order / overflow classes the per-commit gates (sf0.001 +
sf0.01) and the sf0.1 sweep never reach.  No external data and no new
generator: each sf0.1 fact table is replicated K times with every
intra-fact key shifted by ``copy * stride`` so referential integrity
across fact tables is preserved (orders.o_custkey still hits a real
customer in every copy; lineitem.l_orderkey still hits orders).
Dimension tables (region, nation) are NOT scaled — exactly how TPC-H
itself scales — so nationkey/regionkey references stay valid.

Consequences to keep in mind when reading sweep results (fine for
PARITY — both engines read the same files): every document/text row
gains K-1 exact duplicates, so dedup/leakage queries see heavy planted
duplication — a stress case, not a realistic distribution.

Usage: python scripts/make_sf1.py [--src /root/testdata/sf0.1]
       [--dst /tmp/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table: columns shifted by copy*stride (stride = max over the
# REFERENCED table's key so every copy's id space is disjoint)
SHIFT = {
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {
        "o_orderkey": "orders.o_orderkey",
        "o_custkey": "customer.c_custkey",
    },
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {
        "event_id": "events.event_id",
        "user_id": "events.user_id",
    },
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}
DIMS = ("region", "nation")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    tables = {
        t: pq.read_table(f"{args.src}/{t}.parquet")
        for t in DIMS + tuple(SHIFT)
    }
    # stride per referenced key: max value + 1 (id spaces disjoint)
    stride = {}
    for spec in SHIFT.values():
        for ref in spec.values():
            if ref not in stride:
                rt, rc = ref.split(".")
                stride[ref] = int(pc.max(tables[rt][rc]).as_py()) + 1

    for t in DIMS:
        pq.write_table(tables[t], f"{args.dst}/{t}.parquet")
        print(f"{t}: {tables[t].num_rows} rows (dim, unscaled)")

    for t, spec in SHIFT.items():
        src = tables[t]
        copies = []
        for k in range(args.copies):
            tab = src
            for col, ref in spec.items():
                i = tab.schema.get_field_index(col)
                shifted = pc.add(tab[col], k * stride[ref])
                tab = tab.set_column(
                    i, tab.schema.field(i).with_type(shifted.type), shifted
                )
            copies.append(tab)
        out = pa.concat_tables(copies)
        # cast shifted int64 back to the source schema (keys are int64
        # already; this is a no-op guard for future schema changes)
        out = out.cast(src.schema)
        pq.write_table(out, f"{args.dst}/{t}.parquet", row_group_size=65536)
        print(f"{t}: {src.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
