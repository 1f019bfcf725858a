#!/usr/bin/env python3
"""Alternative oracle for dedup_clusters / dedup_survivors at scales where
DuckDB's recursive-CTE closure is infeasible (sf1: 250k-pair graph blows
the 600s per-query budget).

The pair set itself is DuckDB-verified (dedup_minhash_lsh's oracle IS the
same pair SQL the closure walks), so the closure can be recomputed here
with a plain union-find over the VERIFIED Spark pair output — a different
engine than the system under test — and compared against Spark's cluster
and survivor outputs exactly.

Usage: python3 tools/check_clusters_closure.py /tmp/sf1 /tmp/verify_sf1
"""
import glob
import sys

import duckdb


def main(sf_dir, out_dir):
    con = duckdb.connect()
    pairs_files = glob.glob(f"{out_dir}/dedup_minhash_lsh/*.parquet")
    pairs = con.execute(
        f"SELECT id_a, id_b FROM read_parquet({pairs_files!r})").fetchall()
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nodes = set()
    for a, b in pairs:
        nodes.add(a)
        nodes.add(b)
        union(a, b)
    want = {n: find(n) for n in nodes}

    n_fail = 0
    cl_files = glob.glob(f"{out_dir}/dedup_clusters/*.parquet")
    got = dict(con.execute(
        f"SELECT doc_id, cluster FROM read_parquet({cl_files!r})").fetchall())
    if got == want:
        print(f"PASS dedup_clusters ({len(got)} rows, union-find closure)")
    else:
        extra = {k for k in got if k not in want}
        missing = {k for k in want if k not in got}
        diff = {k for k in got if k in want and got[k] != want[k]}
        print(f"FAIL dedup_clusters: extra={len(extra)} missing={len(missing)}"
              f" label-mismatch={len(diff)}")
        n_fail += 1

    drop = {n for n, lbl in want.items() if n != lbl}
    all_docs = set(r[0] for r in con.execute(
        f"SELECT doc_id FROM '{sf_dir}/documents.parquet'").fetchall())
    want_surv = all_docs - drop
    sv_files = glob.glob(f"{out_dir}/dedup_survivors/*.parquet")
    got_surv = set(r[0] for r in con.execute(
        f"SELECT doc_id FROM read_parquet({sv_files!r})").fetchall())
    if got_surv == want_surv:
        print(f"PASS dedup_survivors ({len(got_surv)} rows, union-find closure)")
    else:
        print(f"FAIL dedup_survivors: extra={len(got_surv - want_surv)} "
              f"missing={len(want_surv - got_surv)}")
        n_fail += 1
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
