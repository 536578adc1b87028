#!/usr/bin/env python3
"""Per-query wall-time ratio between two Bench artifacts (the 10x
headroom probe readout): prints every query's base/probe seconds and
ratio, sorted descending, flagging ratios past the threshold (default
15x for the 10x probe -- linear scaling with modest overhead headroom).

Usage: python3 tools/scale_ratio.py bench_last.json bench_last_sf1.json [flag]
"""
import json
import sys


def main() -> int:
    base_path = sys.argv[1] if len(sys.argv) > 1 else "bench_last.json"
    probe_path = sys.argv[2] if len(sys.argv) > 2 else "bench_last_sf1.json"
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    base = json.load(open(base_path))["queries"]
    probe = json.load(open(probe_path))["queries"]
    missing = sorted(set(base) - set(probe))
    rows = []
    for q, b in base.items():
        if q in probe and b > 0:
            rows.append((probe[q] / b, b, probe[q], q))
    rows.sort(reverse=True)
    n_flag = 0
    for r, b, p, q in rows:
        mark = " <-- FLAG" if r > flag else ""
        if r > flag:
            n_flag += 1
        print(f"{q:32s} {b:7.2f}s -> {p:8.2f}s  {r:6.1f}x{mark}")
    print(f"== {len(rows)} compared, {n_flag} past {flag}x flag, "
          f"{len(missing)} missing from probe: {missing}")
    return 1 if n_flag or missing else 0


if __name__ == "__main__":
    sys.exit(main())
