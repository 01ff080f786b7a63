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

Emits a `manifest.json` into the destination dir (per-table row counts
+ sha256 of each emitted parquet file + the generation parameters) so
"same data" is machine-checkable across rounds: a regenerated dir with
a different manifest is NOT comparable with earlier BENCH_SF*
artifacts, and the campaign scripts stamp the manifest into every
artifact they write.
"""
import hashlib
import json
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


def sha256_file(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 22), b""):
            h.update(chunk)
    return h.hexdigest()


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
    path = f"{dst}/{table}.parquet"
    return {"rows": total, "sha256": sha256_file(path),
            "bytes": os.path.getsize(path)}


def manifest_only(dst):
    """Hash an EXISTING scaled dir (rows off parquet metadata + file
    sha256) — for dirs generated before the manifest existed. Marked
    `src: unknown` since the generation inputs weren't recorded.
    """
    tables = {}
    for t in list(SHIFTS) + COPY_ONLY:
        path = f"{dst}/{t}.parquet"
        if not os.path.exists(path):
            continue
        tables[t] = {"rows": pq.ParquetFile(path).metadata.num_rows,
                     "sha256": sha256_file(path),
                     "bytes": os.path.getsize(path)}
    manifest = {"tool": "gen_scale.py --manifest-only", "src": "unknown",
                "copies": None, "tables": tables}
    with open(f"{dst}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"manifest: {dst}/manifest.json")


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--manifest-only":
        manifest_only(sys.argv[2])
        return
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    tables = {}
    for t in list(SHIFTS) + COPY_ONLY:
        tables[t] = scale_table(src, dst, t, 1 if t in COPY_ONLY else n)
    manifest = {"tool": "gen_scale.py", "src": src, "copies": n,
                "tables": tables}
    with open(f"{dst}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"manifest: {dst}/manifest.json")


if __name__ == "__main__":
    main()
