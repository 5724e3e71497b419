#!/usr/bin/env python3
"""Synthetic sf1 corpus: N copies of the sf0.1 fixtures with perturbed
keys, written as multi-row-group parquet — the measured-scale companion
to SCALE.md (VERDICT r4 item 2).

Design choices, stated so the measurements are interpretable:

- Key columns are offset per copy by a large stride with foreign keys
  offset in lockstep, so referential integrity holds within every copy
  and joins fan out 10x without becoming cross products. region/nation
  stay single-copy (dimensions; all copies share them).
- Non-key payloads (text, embeddings, timestamps) are byte-identical
  across copies — deliberate: 10x duplication makes the dedup/LSH cap
  branches fire on real data (posting lists past caps, bucket
  populations past MaxBucket, d10's corpus-known gate) instead of
  passing vacuously as they do on the duplicate-free driver fixtures.
- documents.source is rotated per copy (src_k -> src_{(k+i) mod 20}),
  which manufactures CROSS-SOURCE duplicates: the same text exists
  under several sources, so d10's "absent from the corpus" gate and
  t10's eval-overlap postings finally have work to do.
- Row groups are forced small (nrows/32, floor 10k) so files carry many
  row groups and scan parallelism comes from byte-range splits — the
  layout regime Tables.spread must self-disable in at real scale.
- pyarrow, not Spark, writes the output: events.ts's physical type
  (TIMESTAMP(NANOS) in early testdata generations, timestamp[us]
  since round 6) is preserved bit-for-bit from the source — the gate
  must see the same physical type the driver ships, and Tables.load
  adapts to either.

Usage: python3 tools/scale_gen.py [src] [dst] [copies]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 1 << 33  # far above any fixture key, 10 copies stay well under 2^63

# Key columns offset per copy; FK columns share the owning table's stride
# so every copy is internally consistent.
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ["region", "nation"]


def rotate_source(col, i):
    """src_k -> src_{(k+i) mod 20} (documents has exactly src0..src19)."""
    n = pc.cast(pc.utf8_slice_codeunits(col, 3, 99), pa.int64())
    shifted = pc.add(n, i)
    rotated = pc.subtract(shifted,
                          pc.multiply(pc.divide(shifted, 20), 20))
    return pc.binary_join_element_wise(
        pa.array(["src"] * len(col)), pc.cast(rotated, pa.string()), "")


def expand(table_name, t, copies):
    parts = []
    for i in range(copies):
        cols = []
        for name in t.column_names:
            col = t.column(name)
            if name in OFFSET_COLS.get(table_name, []):
                col = pc.add(col, i * STRIDE)
            elif table_name == "documents" and name == "source":
                col = rotate_source(col.combine_chunks(), i)
            cols.append(col)
        parts.append(pa.table(cols, names=t.column_names))
    return pa.concat_tables(parts)


def main(src="/root/testdata/sf0.1", dst="/root/repo/.scale/sf1", copies=10):
    copies = int(copies)
    os.makedirs(dst, exist_ok=True)
    for name in SINGLE_COPY + list(OFFSET_COLS):
        path = os.path.join(src, f"{name}.parquet")
        t = pq.read_table(path)
        out = t if name in SINGLE_COPY else expand(name, t, copies)
        rg = max(10_000, len(out) // 32)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                       row_group_size=rg)
        md = pq.ParquetFile(os.path.join(dst, f"{name}.parquet")).metadata
        print(f"{name}: {len(out)} rows, {md.num_row_groups} row groups")


if __name__ == "__main__":
    main(*sys.argv[1:4])
