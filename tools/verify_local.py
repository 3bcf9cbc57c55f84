#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

1. (caller) runs graft.Verify to dump each SparkEntry query to outDir/<name>/
   and the oracle SQL to outDir/oracle_sql.json
2. this script creates DuckDB views over the sfDir parquet tables, runs each
   oracle SQL, and compares against the Spark parquet output:
   column names (sorted), row count, and cell-by-cell values.

Exit 0 iff every query with an oracle matches exactly.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    # queries that errored at dump time (graft.Verify writes this artifact
    # so load-time breakage is red here instead of silently absent)
    try:
        dump_errors = json.load(open(f"{out_dir}/verify_errors.json"))
    except FileNotFoundError:
        dump_errors = {}
    for name, msg in sorted(dump_errors.items()):
        failures.append(name)
        print(f"FAIL {name}: dump errored: {msg}")
    for name, sql in sorted(oracle.items()):
        if name in dump_errors:
            continue  # already reported above; no parquet to compare
        try:
            want = con.sql(sql)
            want_cols = sorted(want.columns)
            want_rows = [tuple(r[want.columns.index(c)] for c in want_cols)
                         for r in want.fetchall()]
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = [tuple(r[got.columns.index(c)] for c in got_cols)
                        for r in got.fetchall()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: exception {e}")
            continue
        if want_cols != got_cols:
            failures.append(name)
            print(f"FAIL {name}: columns oracle={want_cols} spark={got_cols}")
            continue
        # Type-strict compare: the driver goes through pandas, where e.g.
        # DuckDB HUGEINT (sum of BIGINT) becomes float64 and hash-mismatches
        # Spark's int64 even when values are equal. Catch that class here.
        def norm_type(t):
            s = str(t).upper()
            return "TIMESTAMP" if s.startswith("TIMESTAMP") else s
        want_types = [norm_type(want.types[want.columns.index(c)]) for c in want_cols]
        got_types = [norm_type(got.types[got.columns.index(c)]) for c in got_cols]
        if want_types != got_types:
            failures.append(name)
            print(f"FAIL {name}: types oracle={want_types} spark={got_types} cols={want_cols}")
            continue
        if len(want_rows) != len(got_rows):
            failures.append(name)
            print(f"FAIL {name}: rows oracle={len(want_rows)} spark={len(got_rows)}")
            continue
        bad = None
        for i, (w, g) in enumerate(zip(want_rows, got_rows)):
            if tuple(map(canon, w)) != tuple(map(canon, g)):
                bad = (i, w, g)
                break
        if bad:
            failures.append(name)
            print(f"FAIL {name}: row {bad[0]} cols={want_cols}\n  oracle={bad[1]}\n  spark ={bad[2]}")
        else:
            print(f"OK   {name}: {len(got_rows)} rows")
    total = len(oracle) + len([n for n in dump_errors if n not in oracle])
    print(f"\n{total - len(failures)}/{total} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
