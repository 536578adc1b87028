#!/usr/bin/env python3
"""Update bench_sf10_family.json from a fresh sf10 subset run: merges
per-query sf0.1 seconds (bench_last.json or a given baseline), sf10
seconds (bench_last_sf10.json), and the 100x ratio, carrying the note
given on the command line.

Usage: python3 tools/family_probe.py <round> "<note>" [baseline] [probe]
"""
import json
import sys


def main() -> int:
    rnd = int(sys.argv[1])
    note = sys.argv[2]
    base_path = sys.argv[3] if len(sys.argv) > 3 else "bench_last.json"
    probe_path = sys.argv[4] if len(sys.argv) > 4 else "bench_last_sf10.json"
    base = json.load(open(base_path))["queries"]
    probe = json.load(open(probe_path))["queries"]
    out = {
        "sf": ("/tmp/sf10 (100x sf0.1 via ScaleUp: docs are 100-way "
               "near-dup clusters, embeddings 100x exact copies -- "
               "adversarial by construction for the pair-generating "
               "family)"),
        "factor_vs_sf01": 100,
        "round": rnd,
        "note": note,
        "queries": {
            q: {
                "sf0.1_s": base[q],
                "sf10_s": probe[q],
                "ratio_at_100x": round(probe[q] / base[q], 1),
            }
            for q in sorted(probe)
            if base.get(q, 0) > 0
        },
    }
    with open("bench_sf10_family.json", "w") as f:
        json.dump(out, f, indent=1)
    n_flag = 0
    for q, r in sorted(out["queries"].items(),
                       key=lambda kv: -kv[1]["ratio_at_100x"]):
        flag = " <-- FLAG" if r["ratio_at_100x"] > 150 else ""
        if r["ratio_at_100x"] > 150:
            n_flag += 1
        print(f"{q:28s} {r['sf0.1_s']:7.2f}s -> {r['sf10_s']:8.2f}s "
              f"{r['ratio_at_100x']:6.1f}x{flag}")
    # a probe member absent from (or zero in) the baseline means the
    # baseline is stale or a subset run clobbered it -- the silent-drop
    # failure mode the r14 verdict flagged; surface it and fail
    missing = sorted(q for q in probe if base.get(q, 0) <= 0)
    if missing:
        print(f"MISSING from baseline (stale/subset {base_path}?): "
              f"{missing}")
    return 1 if n_flag or missing else 0


if __name__ == "__main__":
    sys.exit(main())
