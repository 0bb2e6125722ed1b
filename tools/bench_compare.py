#!/usr/bin/env python3
"""Mechanical bench regression check: compare a BENCH_r{N}.json (or a
raw bench_out.json line) against BASELINE_BENCH.json.

Usage: python3 tools/bench_compare.py <bench.json> [baseline.json]
Exit 1 if any query regresses >1.5x or the total regresses >1.2x.
"""
import json, sys

def load_bench(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)  # BENCH_r{N}.json wraps under "parsed"

def main(bench_path, base_path="BASELINE_BENCH.json"):
    bench = load_bench(bench_path)
    base = json.load(open(base_path))
    rows = []
    for q, t in sorted(bench["queries"].items()):
        b = base["queries"].get(q)
        rows.append((t / b if b else None, q, t, b))
    bad = [(r, q, t, b) for r, q, t, b in rows if r and r > 1.5]
    total_ratio = bench["value"] / base["total_sec"]
    for r, q, t, b in sorted(rows, key=lambda x: -(x[0] or 0)):
        flag = " <-- REGRESSION" if r and r > 1.5 else ""
        print(f"{q:26s} {t:8.2f}s  base={b if b is not None else 'NEW':>7}  "
              f"{f'{r:.2f}x' if r else '':>7}{flag}")
    print(f"\ntotal {bench['value']:.1f}s vs base {base['total_sec']:.1f}s "
          f"({total_ratio:.2f}x), {len(bad)} per-query regressions >1.5x")
    sys.exit(1 if bad or total_ratio > 1.2 else 0)

if __name__ == "__main__":
    main(*sys.argv[1:])
