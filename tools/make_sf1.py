#!/usr/bin/env python3
"""Build a /tmp sf1-scale dataset (10x sf0.1) for the one-off full-gate
scale validation (SCALE.md "sf1 gate").

Replicates each sf0.1 fact table 10x with consistently remapped keys
(replica r adds r*OFFSET to every id column of the same family, so
FK joins stay within-replica and primary keys stay unique).  region and
nation are TPC-H fixed-size dimensions and are copied as-is.  The gate
itself is data-agnostic: Verify (Spark) and check_oracle (DuckDB) both
read THIS directory, so any scale-dependent defect (gate flips, hash
divergence, overflow) shows up as a mismatch.

Usage: python3 tools/make_sf1.py [/tmp/sf1]
"""
import sys
import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
SRC = "/root/testdata/sf0.1"
REPS = 10
BIG = 10_000_000   # orderkey/doc_id/event_id family
SMALL = 1_000_000  # custkey/suppkey/partkey/user_id/vec_id family

# table -> {column: offset}; replica index r multiplies the offset.
REMAP = {
    "region": None,   # copied verbatim (fixed-size dims)
    "nation": None,
    "customer": {"c_custkey": SMALL},
    "supplier": {"s_suppkey": SMALL},
    "part": {"p_partkey": SMALL},
    "orders": {"o_orderkey": BIG, "o_custkey": SMALL},
    "lineitem": {"l_orderkey": BIG, "l_partkey": SMALL, "l_suppkey": SMALL},
    "events": {"event_id": BIG, "user_id": SMALL},
    "documents": {"doc_id": BIG},
    "embeddings": {"vec_id": SMALL},
}


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t, remap in REMAP.items():
        src = f"{SRC}/{t}.parquet"
        dst = f"{OUT}/{t}.parquet"
        if remap is None:
            con.execute(
                f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
        else:
            cols = [c for (c,) in con.execute(
                f"SELECT column_name FROM (DESCRIBE SELECT * FROM '{src}')"
            ).fetchall()]
            sel = ", ".join(
                f"CAST(t.{c} + r.r * {remap[c]} AS BIGINT) AS {c}"
                if c in remap else f"t.{c}" for c in cols)
            con.execute(
                f"COPY (SELECT {sel} FROM '{src}' t "
                f"CROSS JOIN (SELECT unnest(range({REPS})) AS r) r) "
                f"TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()
