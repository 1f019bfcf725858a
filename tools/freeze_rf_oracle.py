#!/usr/bin/env python3
"""Regenerate the frozen ml_random_forest oracle VALUES.

Usage: after changing the RF model/config, run
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/rf_freeze ml_random_forest"
    python3 tools/freeze_rf_oracle.py /tmp/rf_freeze
and paste the printed SQL into MLQueries.oracles["ml_random_forest"].

The query pins its training partitioning (repartition(4, keys) + sorted
partitions), so the seeded model — and therefore these predictions — are
reproducible regardless of the session's core count.
"""
import sys, glob
import duckdb

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rf_freeze"
con = duckdb.connect()
f = glob.glob(f"{out_dir}/ml_random_forest/*.parquet")
rows = con.sql(
    f"SELECT l_orderkey, l_linenumber, pred_qty FROM read_parquet({f!r}) ORDER BY 1, 2"
).fetchall()
vals = ", ".join(f"({int(k)}, {int(ln)}, '{p!r}'::DOUBLE)" for k, ln, p in rows)
print(
    "SELECT CAST(k AS BIGINT) AS l_orderkey, CAST(ln AS INT) AS l_linenumber, p AS pred_qty\n"
    f"FROM (VALUES {vals}) t(k, ln, p)"
)
