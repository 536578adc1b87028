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
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            results[m.group(1)] = {"status": "fail",
                                   "detail": m.group(2)[:300]}
    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    doc = {
        "sf_dir": sf_dir,
        "queries_requested": len(queries) if queries else len(results),
        "pass": n_pass,
        "fail": len(results) - n_pass,
        "results": results,
    }
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"{artifact}: {n_pass} pass / {len(results) - n_pass} fail")
    sys.stdout.write(proc.stdout[-2000:])
    return 0 if n_pass == len(results) and results else 1


if __name__ == "__main__":
    sys.exit(main())
