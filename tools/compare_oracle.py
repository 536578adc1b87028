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

# Chained oracles that DuckDB cannot execute at sf1-class scales (the
# r19 sf1 run proved the 7-stage funnel SQL OOMs DuckDB reproducibly
# while every stage is individually verifiable). When such an oracle
# dies with a resource error, the gate AUTOMATICALLY falls back to its
# stage queries: the composite is reported "infeasible (stage-wise
# green)" -- not a failure -- iff every stage passes in the same run,
# so scale bumps never silently lose funnel coverage (r19 VERDICT #7).
STAGEWISE = {
    "q_curation_funnel": [
        "q_gopher_filter", "q_dedup_exact", "q_substring_dedup",
        "q_minhash_pairs", "q_crosscorpus_neardup",
    ],
}


def is_resource_error(e):
    s = f"{type(e).__name__}: {e}".lower()
    return ("out of memory" in s or "outofmemory" in s
            or "could not allocate" in s or "failed to allocate" in s)


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
    # a subset run asking for a stage-wise composite implicitly needs
    # its stages -- the fallback verdict is only sound if they ran
    for comp, stages in STAGEWISE.items():
        if comp in only:
            only |= set(stages)
    con = duckdb.connect()
    import os
    # let big oracles (sf1 funnel) spill instead of dying at the RAM
    # ceiling; harmless at gate scale
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    # ORACLE_MEM_LIMIT reproduces the sf1 funnel infeasibility at any
    # scale (DuckDB hits its ceiling on the unspillable chained SQL)
    # -- used to exercise the STAGEWISE fallback without a 100 GiB box
    if os.environ.get("ORACLE_MEM_LIMIT"):
        con.sql(f"SET memory_limit='{os.environ['ORACLE_MEM_LIMIT']}'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata ships single files; ScaleUp writes Spark
        # output DIRECTORIES — glob those
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    status = {}
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
            status[name] = "fail"
            continue
        try:
            want_rel = con.sql(sql)
            want = want_rel.fetchall()
            wcols = [d[0] for d in want_rel.description]
        except Exception as e:
            if name in STAGEWISE and is_resource_error(e):
                # verdict deferred to the stage post-pass below
                status[name] = ("oracle_resource", str(e)[:300])
                continue
            print(f"FAIL {name}: oracle sql error: {str(e)[:300]}")
            n_fail += 1
            status[name] = "fail"
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: schema {sorted(gcols)} != {sorted(wcols)}")
            n_fail += 1
            status[name] = "fail"
            continue
        # driver sorts columns by name before hashing
        gidx = [gcols.index(c) for c in sorted(gcols)]
        widx = [wcols.index(c) for c in sorted(wcols)]
        grows = sorted(tuple(norm(r[i]) for i in gidx) for r in got)
        wrows = sorted(tuple(norm(r[i]) for i in widx) for r in want)
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} != {len(wrows)}")
            n_fail += 1
            status[name] = "fail"
            continue
        if grows != wrows:
            bad = next(i for i, (a, b) in enumerate(zip(grows, wrows))
                       if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  spark : {grows[bad]}")
            print(f"  oracle: {wrows[bad]}")
            n_fail += 1
            status[name] = "fail"
            continue
        print(f"PASS {name} ({len(grows)} rows)")
        n_pass += 1
        status[name] = "pass"
    # stage-wise post-pass: a composite whose oracle died on resources
    # is green iff every stage passed in this run, failed otherwise
    for comp, stages in STAGEWISE.items():
        st = status.get(comp)
        if not (isinstance(st, tuple) and st[0] == "oracle_resource"):
            continue
        missing = [s for s in stages if status.get(s) != "pass"]
        if missing:
            print(f"FAIL {comp}: oracle infeasible ({st[1][:120]}) and "
                  f"stage-wise fallback incomplete: {missing}")
            n_fail += 1
        else:
            print(f"STAGEWISE {comp}: oracle infeasible at this scale "
                  f"({st[1][:120]}); gated by stages "
                  f"{','.join(stages)} -- all pass")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
