#!/usr/bin/env python3
"""Per-query diff of two graft.Bench records (full-record JSON files).

Usage: python3 tools/bench_diff.py A.json B.json [--min-sec 0.05]

Prints queries sorted by absolute delta (B - A), plus totals over the
shared query set and the machine-context blocks of both records, so a
reader can discount a contended side before believing any delta.
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    min_sec = 0.05
    if "--min-sec" in sys.argv:
        min_sec = float(sys.argv[sys.argv.index("--min-sec") + 1])
    a, b = load(a_path), load(b_path)
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    rows = [(qb[q] - qa[q], qa[q], qb[q], q) for q in shared]
    rows.sort(key=lambda r: r[0])
    print(f"A: {a_path}  total={a['value']}  config={a.get('config')}")
    print(f"   machine={a.get('machine')}")
    print(f"B: {b_path}  total={b['value']}  config={b.get('config')}")
    print(f"   machine={b.get('machine')}")
    print()
    print(f"{'delta':>8}  {'A':>8}  {'B':>8}  {'B/A':>6}  query")
    for d, va, vb, q in rows:
        if abs(d) < min_sec:
            continue
        ratio = vb / va if va > 0 else float("inf")
        print(f"{d:+8.3f}  {va:8.3f}  {vb:8.3f}  {ratio:6.2f}  {q}")
    ta = sum(qa[q] for q in shared)
    tb = sum(qb[q] for q in shared)
    print()
    print(f"shared {len(shared)} queries: A={ta:.2f}s  B={tb:.2f}s  "
          f"B-A={tb-ta:+.2f}s  B/A={tb/ta:.3f}")
    if only_a:
        print(f"only in A: {only_a}")
    if only_b:
        print(f"only in B: {only_b}")
    for name, rec in (("A", a), ("B", b)):
        if rec.get("n_failed"):
            print(f"!! {name} has {rec['n_failed']} FAILED queries: "
                  f"{sorted(rec.get('errors', {}))}")


if __name__ == "__main__":
    main()
