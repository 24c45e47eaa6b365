#!/usr/bin/env python3
"""Synthesize an sf1-scale corpus (10x sf0.1) for the full-oracle sweep.

Design: ten KEY-SHIFTED DISJOINT REPLICAS of sf0.1, so that
  - referential integrity holds within each replica (joins never cross
    replicas -> no many-to-many blowup: every join/agg scales linearly);
  - document text in replicas 1..9 gets a per-token replica suffix
    ("tok" -> "tokrI"), keeping shingle spaces disjoint across replicas:
    the Jaccard/MinHash/SimHash candidate volume grows 10x (linear), not
    100x (the identical-copy blowup the round-7 stress sweep measured);
  - replica 0 is byte-identical to sf0.1, so every bounded oracle slice
    (doc_id < 300, vec_id < 1000, doc_id < 600) selects exactly the
    sf0.1 slice and stays feasible in DuckDB;
  - region/nation stay fixed (5/25 rows), as TPC-H does at every SF.

Numeric headroom note: DISC_PRICE now sums in 1e-4 fixed point (cents x
discount-hundredths -- exact, both source columns carry 2 decimals),
peaking at ~5e14 per q1 group at sf1 and ~5e15 at sf10, 3 decades under
int64 max. (The earlier 1e-8 unit capped the sweep at sf1: 5.05e18 per
group, 1.8x under max, overflowing at sf10.) The binding ceiling is now
lsum(l_extendedprice) micro-units: ~3.8e17 per q1 group at sf10, which
holds to ~sf100. Replicas are written incrementally (one row group per
replica) so sf10 (N=100) builds in constant memory.

pyarrow (driver-side tooling, like scripts/check.py) preserves physical
parquet types exactly -- notably the events table's nanosecond
timestamps, which a DuckDB round-trip would silently truncate to us.

Usage: python3 scripts/make_sf1.py [src_sf_dir] [dst_dir] [n_replicas]
"""
import sys, os, shutil
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key column -> per-replica shift (disjoint key spaces; nationkey/regionkey
# deliberately absent: dims stay shared, every replica joins to the same
# 25 nations exactly as sf0.1 rows do)
SHIFTS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
COPY_AS_IS = ["region", "nation"]


def shifted(table: pa.Table, shifts: dict, i: int) -> pa.Table:
    for col, step in shifts.items():
        idx = table.schema.get_field_index(col)
        f = table.schema.field(idx)
        s = pc.add(table.column(idx), pa.scalar(i * step, type=f.type))
        table = table.set_column(idx, f, s)
    return table


def suffix_tokens(table: pa.Table, i: int) -> pa.Table:
    """Per-token replica suffix on documents.text (replicas 1..9 only),
    with n_chars recomputed (the sf0.1 invariant n_chars == length(text)
    holds, so downstream consumers keep seeing a consistent column)."""
    texts = table.column("text").to_pylist()
    out = [" ".join(tok + f"r{i}" for tok in t.split(" ")) if t is not None
           else None for t in texts]
    tf = table.schema.field("text")
    table = table.set_column(table.schema.get_field_index("text"), tf,
                             pa.array(out, type=tf.type))
    nf = table.schema.field("n_chars")
    n_chars = pa.array([len(t) if t is not None else None for t in out],
                       type=nf.type)
    return table.set_column(table.schema.get_field_index("n_chars"), nf, n_chars)


def main():
    os.makedirs(DST, exist_ok=True)
    for t in COPY_AS_IS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
        print(f"{t}: copied")
    for t, shifts in SHIFTS.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        writer = None
        for i in range(N):
            r = shifted(base, shifts, i)
            if t == "documents" and i > 0:
                r = suffix_tokens(r, i)
            if writer is None:
                writer = pq.ParquetWriter(f"{DST}/{t}.parquet", r.schema)
            writer.write_table(r)
        writer.close()
        print(f"{t}: {base.num_rows} -> {base.num_rows * N}")


if __name__ == "__main__":
    main()
