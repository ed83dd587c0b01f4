#!/usr/bin/env python3
"""Synthesize an sf1-scale fixture (10x sf0.1) for a third correctness
decade (round-14 verdict stretch item).

The driver ships sf{0.001,0.01,0.1}; the scale-invariance claim rests on
two full-surface decades plus synthetic rehearsal subsets. This tool
manufactures a referentially-consistent 10x decade from sf0.1 by
UNIONING 10 KEY-OFFSET COPIES of the fact tables: every copy offsets
each table's primary key — and every foreign key that references it —
by `i * (max_key + 1)` of the ORIGINAL table, so joins resolve within a
copy exactly as they do at sf0.1. Dimension-ish tables (region, nation,
part, supplier) stay at original size: facts growing faster than
dimensions is the realistic shape, and every FK into them stays valid.

Correctness needs no "blessing" of this data: the gate compares Spark
and DuckDB over the SAME parquet files, so any well-formed fixture is a
valid decade. Two deliberate choices:
  - document text is copied VERBATIM -> 10 exact duplicates of every
    doc, a stress test for the dedup family at ratio 10:1 (both engines
    see the same duplicates);
  - embeddings get a tiny per-copy float32 jitter (+i * 1e-3) so ANN
    scores are not pervasively tied across copies — duplicate-vector
    ties would test tie-breaking, not search. The jitter is materialized
    into the parquet, so both engines fold identical floats.

Usage: python3 tools/make_sf1.py [outdir=/tmp/graft-sf1]
"""
import sys, os, shutil
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = "/root/testdata/sf0.1"
COPIES = 10

COPY_AS_IS = ["region", "nation", "part", "supplier"]
# table -> {column: stride-source (table, key)}
OFFSETS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "orders": {"o_orderkey": ("orders", "o_orderkey"),
               "o_custkey": ("customer", "c_custkey")},
    "lineitem": {"l_orderkey": ("orders", "o_orderkey")},
    "events": {"event_id": ("events", "event_id"),
               "user_id": ("events", "user_id")},
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}


def stride_of(cache, table, key):
    if (table, key) not in cache:
        t = pq.read_table(f"{SRC}/{table}.parquet", columns=[key])
        cache[(table, key)] = pc.max(t[key]).as_py() + 1
    return cache[(table, key)]


def jitter_list_f32(col, delta):
    """embedding + delta elementwise, preserving list<float> type."""
    out_chunks = []
    for chunk in col.chunks if isinstance(col, pa.ChunkedArray) else [col]:
        arr = chunk
        values = pc.add(arr.values, pa.scalar(delta, pa.float32()))
        lst = pa.ListArray.from_arrays(arr.offsets, values)
        out_chunks.append(lst.cast(arr.type))
    return pa.chunked_array(out_chunks)


def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    cache = {}
    for t in COPY_AS_IS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{outdir}/{t}.parquet")
        print(f"{t}: copied as-is")
    for t, offs in OFFSETS.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        copies = []
        for i in range(COPIES):
            cols = {}
            for name in base.column_names:
                col = base[name]
                if name in offs:
                    st, sk = offs[name]
                    col = pc.add(col, pa.scalar(
                        i * stride_of(cache, st, sk), col.type))
                elif t == "embeddings" and name == "embedding" and i > 0:
                    col = jitter_list_f32(col, i * 1e-3)
                cols[name] = col
            copies.append(pa.table(cols, schema=base.schema))
        out = pa.concat_tables(copies)
        assert out.schema == base.schema, f"{t}: schema drifted"
        pq.write_table(out, f"{outdir}/{t}.parquet")
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-sf1")
