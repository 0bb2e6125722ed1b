#!/usr/bin/env python3
"""Mechanical bench regression check: compare a BENCH_r{N}.json (or a
raw bench_out.json line) against BASELINE_BENCH.json.

Usage: python3 tools/bench_compare.py <bench.json> [baseline.json]
Exit 1 if any query regresses >1.5x, the total regresses >1.2x, the
bench recorded failed queries, or any baseline query is missing from
(or null/zero in) the new bench — a query that stops running must
never read as an improvement.
"""
import hashlib, json, os, sys

def load_bench(path):
    with open(path) as f:
        d = json.load(f)
    d = d.get("parsed", d)  # BENCH_r{N}.json wraps under "parsed"
    if "queries" not in d and "qv" in d:
        # qv rung (86+ query registries): values array aligned to the
        # SORTED registry names. Recover the names from BENCH_FULL.json
        # (the tracked full record of the same run, next to the bench
        # file or in the cwd) and verify the alignment fingerprint
        # before zipping — a mismatch means the registry changed
        # between the bench run and this read.
        cands = [os.path.join(os.path.dirname(os.path.abspath(path)), "BENCH_FULL.json"),
                 "BENCH_FULL.json"]
        full = next((c for c in cands if os.path.exists(c)), None)
        if full is None:
            sys.exit(f"{path} is a qv-rung line but no BENCH_FULL.json found for its names")
        names = sorted(json.load(open(full))["queries"])
        fp = hashlib.md5(",".join(names).encode()).hexdigest()[:8]
        if fp != d.get("qn_md5") or len(names) != len(d["qv"]):
            sys.exit(f"qv fingerprint {d.get('qn_md5')}/{len(d['qv'])} does not match "
                     f"{full}'s names ({fp}/{len(names)}) — registry drift, refusing to zip")
        d["queries"] = dict(zip(names, d["qv"]))
    return d

def main(bench_path, base_path="BASELINE_BENCH.json"):
    bench = load_bench(bench_path)
    base = json.load(open(base_path))
    failed = bench.get("failed", [])
    rows = []
    for q, t in sorted(bench["queries"].items()):
        b = base["queries"].get(q)
        r = t / b if (b and t is not None) else None
        rows.append((r, q, t, b))
    # baseline queries that vanished from (or recorded nothing in) the
    # new bench: Bench.scala writes null for all-sweeps-failed queries,
    # and a renamed/dropped query simply won't appear
    gone = sorted(set(base["queries"]) - set(bench["queries"]))
    dead = sorted(q for q, t in bench["queries"].items()
                  if q in base["queries"] and not t)
    bad = [(r, q, t, b) for r, q, t, b in rows if r and r > 1.5]
    total_ratio = bench["value"] / base["total_sec"]
    for r, q, t, b in sorted(rows, key=lambda x: -(x[0] or 0)):
        flag = " <-- REGRESSION" if r and r > 1.5 else ""
        if q in failed:
            flag += " <-- FAILED"
        ts = f"{t:8.2f}s" if t is not None else "    null "
        print(f"{q:26s} {ts}  base={b if b is not None else 'NEW':>7}  "
              f"{f'{r:.2f}x' if r else '':>7}{flag}")
    for q in gone:
        print(f"{q:26s}     GONE  base={base['queries'][q]:>7}          <-- MISSING")
    cpu = bench.get("cpu_sec_total")
    cpu_note = f", cpu {cpu:.1f}s" if cpu else ""
    print(f"\ntotal {bench['value']:.1f}s vs base {base['total_sec']:.1f}s "
          f"({total_ratio:.2f}x){cpu_note}, {len(bad)} per-query regressions >1.5x, "
          f"{len(failed)} failed, {len(gone) + len(dead)} missing/null vs baseline")
    sys.exit(1 if bad or total_ratio > 1.2 or failed or gone or dead else 0)

if __name__ == "__main__":
    main(*sys.argv[1:])
