#!/usr/bin/env python3
"""Scale a driver testdata dir N-fold for stress benches (driver-side
tool, not part of the shipped library).

Facts and entity tables are replicated with key-shifted copies so joins
keep their fan-in shape; events keep their timestamp[ns] physical type;
document text gets a per-copy token suffix so copies are NOT near-dups
of each other (a verbatim copy would square the dedup pair counts and
turn a 10x scale-up into a 100x pair blowup — token-suffixed copies
keep within-copy near-dup structure identical, so pair counts scale
linearly like a real 10x corpus).
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFTS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]


def scale_table(src, dst, table, n):
    # Stream one key-shifted copy at a time through a ParquetWriter so
    # n=100 (sf10) stays bounded at ~one-copy of Arrow memory.
    tbl = pq.read_table(f"{src}/{table}.parquet")
    shifts = SHIFTS.get(table, [])
    strides = {c: pc.max(tbl[c]).as_py() + 1 for c in shifts}
    writer = pq.ParquetWriter(f"{dst}/{table}.parquet", tbl.schema)
    total = 0
    for i in range(n):
        cols = {}
        for name in tbl.column_names:
            col = tbl[name].combine_chunks()
            if name in shifts and i > 0:
                col = pc.add(col, i * strides[name])
            cols[name] = col
        if table == "documents" and i > 0:
            # suffix every token: copy i shares no shingles with copy 0
            cols["text"] = pc.replace_substring_regex(
                cols["text"], pattern=r"(\S+)", replacement=rf"\1x{i}")
            cols["n_chars"] = pc.cast(
                pc.utf8_length(cols["text"]), tbl.schema.field("n_chars").type)
        part = pa.table(cols).cast(tbl.schema)
        writer.write_table(part)
        total += part.num_rows
    writer.close()
    print(f"{table}: {tbl.num_rows} -> {total}")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for t in list(SHIFTS) + COPY_ONLY:
        scale_table(src, dst, t, 1 if t in COPY_ONLY else n)


if __name__ == "__main__":
    main()
