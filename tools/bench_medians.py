#!/usr/bin/env python3
"""Merge N bench_out.json runs into per-query medians for BASELINE.md.

Usage: python3 tools/bench_medians.py run1.json run2.json [run3.json ...]

Prints the BASELINE.md per-query markdown table (sorted by query name),
the sum-of-medians total, and each input run's own total — the recording
protocol BASELINE.md documents (per-query medians of >=3 consecutive
cold driver-identical runs; medians absorb one ambient-load-inflated
run on this shared box).
"""
import json
import statistics
import sys


def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append(json.load(f)["queries"])
    names = set(runs[0])
    for r in runs[1:]:
        if set(r) != names:
            raise SystemExit(f"query sets differ across runs: "
                             f"{sorted(set(r) ^ names)}")
    med = {q: statistics.median(r[q] for r in runs) for q in sorted(names)}
    for p, r in zip(paths, runs):
        print(f"run total {p}: {sum(r.values()):.2f} s")
    print(f"queries: {len(med)}; sum of medians: {sum(med.values()):.2f} s")
    print()
    print("| query | sec |")
    print("|---|---|")
    for q in sorted(med):
        print(f"| {q} | {med[q]:.3f} |")


if __name__ == "__main__":
    main(sys.argv[1:])
