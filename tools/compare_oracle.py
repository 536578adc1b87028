#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads the parquet
dumps written by graft.Verify plus oracle_sql.json, runs each oracle in
DuckDB against the sf tables, and compares rows / schema / values.

Usage: compare_oracle.py <verify_out_dir> <sf_dir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    # let big oracles (sf1 funnel) spill instead of dying at the RAM
    # ceiling; harmless at gate scale
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata ships single files; ScaleUp writes Spark
        # output DIRECTORIES — glob those
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            gcols = [d[0] for d in con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").description]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            want_rel = con.sql(sql)
            want = want_rel.fetchall()
            wcols = [d[0] for d in want_rel.description]
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:300]}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: schema {sorted(gcols)} != {sorted(wcols)}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        gidx = [gcols.index(c) for c in sorted(gcols)]
        widx = [wcols.index(c) for c in sorted(wcols)]
        grows = sorted(tuple(norm(r[i]) for i in gidx) for r in got)
        wrows = sorted(tuple(norm(r[i]) for i in widx) for r in want)
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} != {len(wrows)}")
            n_fail += 1
            continue
        if grows != wrows:
            bad = next(i for i, (a, b) in enumerate(zip(grows, wrows))
                       if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  spark : {grows[bad]}")
            print(f"  oracle: {wrows[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(grows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
