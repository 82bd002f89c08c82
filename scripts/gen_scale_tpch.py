#!/usr/bin/env python3
"""Clone the driver's sf0.1 star schema at an integer multiplier for
scaling-exponent runs (driver-side tooling; see gen_scale_data.py).

Each copy i remaps the PRIMARY keys (orderkey/custkey/partkey/suppkey
offset by i*stride) and every foreign key follows, so per-key join
fan-outs, value distributions, filter selectivities and group-by
cardinalities are preserved EXACTLY while fact and dimension tables all
grow by the multiplier — the honest TPC-H scaling shape (dims scale
with sf). nation/region stay fixed. events clones remap event_id and
user_id the same way (constant per-user density).

Usage: gen_scale_tpch.py <srcdir> <outdir> <multiplier>
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def clone(table, mult, offsets):
    """offsets: {column: stride} — col' = col + i*stride for copy i."""
    cols = {c: table.column(c).to_numpy(zero_copy_only=False)
            for c in table.column_names}
    out = {}
    for c in table.column_names:
        parts = []
        for i in range(mult):
            v = cols[c]
            if c in offsets:
                v = v + i * offsets[c]
            parts.append(v)
        out[c] = pa.array(np.concatenate(parts),
                          type=table.schema.field(c).type)
    return pa.table(out, schema=table.schema)


def main():
    src, out, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(out, exist_ok=True)

    def rd(name):
        return pq.read_table(f"{src}/{name}.parquet")

    def stride(tbl, key):
        return int(tbl.column(key).to_numpy().max()) + 1

    li, od = rd("lineitem"), rd("orders")
    cu, su, pt = rd("customer"), rd("supplier"), rd("part")
    ev = rd("events")
    sOk, sCk = stride(od, "o_orderkey"), stride(cu, "c_custkey")
    sPk, sSk = stride(pt, "p_partkey"), stride(su, "s_suppkey")
    sEv, sU = stride(ev, "event_id"), stride(ev, "user_id")

    pq.write_table(clone(li, mult, {
        "l_orderkey": sOk, "l_partkey": sPk, "l_suppkey": sSk}),
        f"{out}/lineitem.parquet")
    pq.write_table(clone(od, mult, {
        "o_orderkey": sOk, "o_custkey": sCk}), f"{out}/orders.parquet")
    pq.write_table(clone(cu, mult, {"c_custkey": sCk}),
                   f"{out}/customer.parquet")
    pq.write_table(clone(su, mult, {"s_suppkey": sSk}),
                   f"{out}/supplier.parquet")
    pq.write_table(clone(pt, mult, {"p_partkey": sPk}),
                   f"{out}/part.parquet")
    pq.write_table(clone(ev, mult, {"event_id": sEv, "user_id": sU}),
                   f"{out}/events.parquet")
    for small in ["nation", "region", "documents", "embeddings"]:
        pq.write_table(rd(small), f"{out}/{small}.parquet")
    print(f"wrote {out} at {mult}x from {src}")


if __name__ == "__main__":
    main()
