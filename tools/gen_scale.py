#!/usr/bin/env python3
"""Synthesize an N-times replica of a testdata sf dir (driver-side tooling,
like check_oracle.py) so the bench can measure a scaling point beyond the
overhead-bound regime.

Usage: python3 tools/gen_scale.py <srcDir> <dstDir> [factor=10]

Facts replicate with shifted keys (FK pairs shift together so joins keep
their selectivity); dimensions copy as-is — the realistic big-data shape
(facts >> dims, broadcast joins stay broadcast). documents.text gets a
per-replica suffix so the dedup family sees 10 NEAR-duplicates per
original (web-scale dup structure) instead of collapsing to exact dups.
Schemas are preserved byte-exact via pyarrow (events.ts stays
TIMESTAMP(NANOS)).

Row groups: one per replica (row_group_size = the source table's row
count), so N x data carries N x scan splits of the SAME per-task work as
the source file — the weak-scaling shape a real cluster sees (10x data =
10x files), and the shape Spark can actually parallelize (a row group is
the atomic split unit). pyarrow's default 1M-row groups previously left
the decade orders file at 2 splits and events at 1: every scan-bound
query then paid ~5x per-task scan growth per decade, a fixture artifact
that read as super-linearity in scale_flags.
"""
import sys, os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DIMS = ["region", "nation", "customer", "supplier", "part"]
# fact -> columns to shift by r * (max+1) of the FIRST column
FACTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    src, dst = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    # orders/lineitem share the orderkey domain: one shift stride for both
    # (lineitem skipped in the loop — its stride IS orders', so FK pairs
    # land in the same replica)
    stride = {}
    for t, keys in FACTS.items():
        if t == "lineitem":
            continue
        tab = pq.read_table(f"{src}/{t}.parquet", columns=[keys[0]])
        stride[t] = pc.max(tab.column(0)).as_py() + 1
    stride["lineitem"] = stride["orders"]
    for t in DIMS:
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            pq.write_table(pq.read_table(p), f"{dst}/{t}.parquet")
    for t, keys in FACTS.items():
        tab = pq.read_table(f"{src}/{t}.parquet")
        out = []
        for r in range(factor):
            rep = tab
            for k in keys:
                i = rep.schema.get_field_index(k)
                shifted = pc.add(rep.column(i), r * stride[t])
                rep = rep.set_column(i, rep.schema.field(i),
                                     shifted.cast(rep.schema.field(i).type))
            if t == "documents" and r > 0:
                i = rep.schema.get_field_index("text")
                suffixed = pc.binary_join_element_wise(
                    rep.column(i).cast(pa.string()), f"r{r}", " ")
                rep = rep.set_column(i, rep.schema.field(i),
                                     suffixed.cast(rep.schema.field(i).type))
            out.append(rep)
        big = pa.concat_tables(out)
        pq.write_table(big, f"{dst}/{t}.parquet",
                       row_group_size=max(tab.num_rows, 1))
        print(t, big.num_rows, "rows", factor, "row groups")


if __name__ == "__main__":
    main()
