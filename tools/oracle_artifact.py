#!/usr/bin/env python3
"""Run tools/compare_oracle.py and persist its verdicts as a JSON
artifact — the committed form of an off-gate oracle run (e.g. the r19
sf1 spot-verification of the scale-sensitive query family, whose caps
and thresholds engage differently at 10x data).

Usage: oracle_artifact.py <verify_out_dir> <sf_dir> <artifact.json> [query ...]
"""
import json
import re
import subprocess
import sys


def main():
    out_dir, sf_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    queries = sys.argv[4:]
    proc = subprocess.run(
        [sys.executable, "tools/compare_oracle.py", out_dir, sf_dir] + queries,
        capture_output=True, text=True)
    results = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
        if m:
            results[m.group(1)] = {"status": "pass",
                                   "rows": int(m.group(2))}
            continue
        m = re.match(r"STAGEWISE (\S+): (.*)", line)
        if m:
            # composite oracle infeasible at this scale, every stage
            # green in the same run (compare_oracle.py STAGEWISE) —
            # recorded as its own status, counted neither pass nor fail
            results[m.group(1)] = {"status": "oracle_infeasible",
                                   "detail": m.group(2)[:300]}
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            results[m.group(1)] = {"status": "fail",
                                   "detail": m.group(2)[:300]}
    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    n_inf = sum(1 for r in results.values()
                if r["status"] == "oracle_infeasible")
    n_fail = len(results) - n_pass - n_inf
    doc = {
        "sf_dir": sf_dir,
        "queries_requested": len(queries) if queries else len(results),
        "pass": n_pass,
        "fail": n_fail,
        "oracle_infeasible": n_inf,
        "results": results,
    }
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"{artifact}: {n_pass} pass / {n_fail} fail / "
          f"{n_inf} oracle-infeasible")
    sys.stdout.write(proc.stdout[-2000:])
    return 0 if n_fail == 0 and results else 1


if __name__ == "__main__":
    sys.exit(main())
