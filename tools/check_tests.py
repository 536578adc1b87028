#!/usr/bin/env python3
"""Round-end test gate (VERDICT r17 #3): parse the ScalaTest JUnit XML
reports under target/test-reports, FAIL LOUDLY (exit 1) if any test
failed or errored, and write SUITE_SUMMARY.json so the round-end commit
carries a green suite-summary artifact.

Usage:  sbt test ; python3 tools/check_tests.py
"""
import datetime
import glob
import json
import os
import sys
import xml.etree.ElementTree as ET

reports = sorted(glob.glob("target/test-reports/TEST-*.xml"))
if not reports:
    print("NO TEST REPORTS under target/test-reports — run `sbt test` first",
          file=sys.stderr)
    sys.exit(2)

total = fail = err = skip = suites = 0
newest = 0.0
failures = []
for path in reports:
    root = ET.parse(path).getroot()
    suites += 1
    total += int(root.get("tests", 0))
    fail += int(root.get("failures", 0))
    err += int(root.get("errors", 0))
    skip += int(root.get("skipped", 0) or 0)
    newest = max(newest, os.path.getmtime(path))
    for tc in root.iter("testcase"):
        for f in list(tc.iter("failure")) + list(tc.iter("error")):
            failures.append({
                "suite": root.get("name"),
                "test": tc.get("name"),
                "message": (f.get("message") or "")[:300],
            })

summary = {
    "suites": suites,
    "tests": total,
    "failures": fail,
    "errors": err,
    "skipped": skip,
    "green": fail == 0 and err == 0,
    "newest_report_utc": datetime.datetime.utcfromtimestamp(newest)
        .isoformat() + "Z",
    "failed": failures,
}
with open("SUITE_SUMMARY.json", "w") as out:
    json.dump(summary, out, indent=1)
    out.write("\n")

print(json.dumps({k: summary[k]
                  for k in ("suites", "tests", "failures", "errors", "green")}))
for f in failures:
    print(f"FAIL {f['suite']} :: {f['test']} :: {f['message']}",
          file=sys.stderr)
sys.exit(1 if failures else 0)
