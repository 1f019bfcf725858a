#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query, reads outDir/<name> (spark parquet dir) and compares it with
the DuckDB result of outDir/oracle_sql.json[name] executed against views over
the same sf parquet tables. Columns sorted by name, rows sorted by all
columns, exact value compare (tiny float tolerance reported separately).
"""
import json, sys, glob, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    # big oracles (array-heavy ANN/semdedup mirrors at sf1) otherwise grow
    # unbounded and get OOM-killed; cap the heap and spill to disk instead.
    # ORACLE_MEM overrides for solo runs of the recursive-closure mirrors
    # (dedup_clusters/dedup_survivors at sf1 spill past the default + this
    # box's free disk when run inside the full sequence).
    mem = os.environ.get("ORACLE_MEM", "80GB")
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_tmp'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        # Driver-faithful dtype gate (r16 verdict item 2): the driver's hash
        # is KIND-sensitive — a value-exact result with a DuckDB HUGEINT
        # sum (-> pandas float64) vs Spark int64 fails it (r5/r16
        # incidents), while integer WIDTH differences (int32 vs int64,
        # 15 registry queries as of r17) pass it. Compare dtype kind
        # (int/uint collapsed to one class) so this gate matches the
        # driver exactly: no false green on sum(BIGINT), no false red on
        # narrow ints.
        def _kind(dt):
            k = dt.kind
            return "i" if k in ("i", "u") else k
        dt_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in got.columns
                  if _kind(got[c].dtype) != _kind(want[c].dtype)]
        if dt_bad:
            c, dg, dw = dt_bad[0]
            print(f"FAIL {name}: dtype col={c} spark={dg} oracle={dw}"
                  f" (wrap the oracle output in CAST(... AS BIGINT)?)")
            n_fail += 1
            continue
        got = got.sort_values(by=list(got.columns), ignore_index=True)
        want = want.sort_values(by=list(want.columns), ignore_index=True)
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            for i in range(len(a)):
                x, y = a.iloc[i], b.iloc[i]
                xn = isinstance(x, float) and math.isnan(x)
                yn = isinstance(y, float) and math.isnan(y)
                if x is None and y is None:
                    continue
                if xn or yn:
                    if not (xn and yn):
                        mismatch = (c, i, x, y)
                        break
                    continue
                if x != y:
                    mismatch = (c, i, x, y)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, x, y = mismatch
            print(f"FAIL {name}: col={c} row={i} spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

def selftest():
    """The dtype gate must FAIL on a value-exact but HUGEINT-summed oracle
    (the r5/r16 failure class) and PASS once the sum is CAST to BIGINT."""
    import os, tempfile
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(f"{d}/q")
        con.execute(f"COPY (SELECT CAST(3 AS BIGINT) AS s) "
                    f"TO '{d}/q/part.parquet' (FORMAT PARQUET)")
        got = con.execute(
            f"SELECT * FROM read_parquet('{d}/q/part.parquet')").fetchdf()
        bare = con.execute(
            "SELECT sum(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x "
            "UNION ALL SELECT 2)").fetchdf()
        cast = con.execute(
            "SELECT CAST(sum(x) AS BIGINT) AS s FROM "
            "(SELECT CAST(1 AS BIGINT) AS x UNION ALL SELECT 2)").fetchdf()
        assert (got["s"] == bare["s"]).all(), "values should be exact"
        assert str(got["s"].dtype) != str(bare["s"].dtype), \
            "bare sum(BIGINT) must be flagged (dtype differs)"
        assert str(got["s"].dtype) == str(cast["s"].dtype), \
            "CAST(... AS BIGINT) must restore int64"
    print("selftest: PASS (bare sum flagged, CAST accepted)")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sf, out, only))
