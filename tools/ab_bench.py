#!/usr/bin/env python3
"""Compare two Bench JSON artifacts with host-factor normalization.

The bench host's throughput swings ±15-100% between windows, so raw
per-query deltas between two runs mostly measure the weather. This tool
estimates the host factor as the median ratio over a basket of queries
you did NOT change, divides it out, and reports adjusted deltas for the
queries you DID change.

Usage:
  python3 tools/ab_bench.py BEFORE.json AFTER.json [changed_q1 changed_q2 ...]

With no changed-query args, every query is reported (sorted by adjusted
ratio); the host factor is then estimated over ALL queries, which is
conservative when many changed.
"""
import json
import statistics
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    common = sorted(set(a) & set(b))
    changed = [q for q in sys.argv[3:]]
    for q in changed:
        if q not in common:
            sys.exit(f"unknown query: {q}")
    basket = [q for q in common if q not in changed] if changed else common
    ratios = [b[q] / a[q] for q in basket if a[q] > 0]
    factor = statistics.median(ratios) if ratios else 1.0
    if not ratios or factor == 0:
        factor = 1.0
        print("WARNING: empty/degenerate basket; host factor forced to 1.0")
    print(f"host factor (median over {len(ratios)} unchanged): {factor:.2f}")
    report = changed if changed else common
    rows = [(q, a[q], b[q], (b[q] / factor) / a[q]) for q in report if a[q] > 0]
    rows.sort(key=lambda r: r[3])
    for q, av, bv, adj in rows:
        flag = "  <-- regression?" if adj > 1.15 else ""
        print(f"{q:30s} {av:6.2f} -> {bv:6.2f}  adjusted x{adj:4.2f}{flag}")
    ta, tb = sum(a[q] for q in common), sum(b[q] for q in common)
    print(f"totals: {ta:.1f} -> {tb:.1f}  (host-adjusted {tb / factor:.1f})")


if __name__ == "__main__":
    main()
