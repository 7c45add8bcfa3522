#!/usr/bin/env python3
"""Scale-gate analysis: compare per-query bench JSONs across scale factors
and local-vs-forced-distributed runs.

Usage: scale_gate.py SF01.json SF1.json [DIST01.json DIST1.json]

Prints a markdown table (query, sf0.1 s, sf1 s, ratio) sorted by ratio,
flagging queries whose sf1 time exceeds 10x the sf0.1 time (superlinear
scaling for a 10x data increase) plus the gate summary.
"""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    return d["queries"], set(d.get("errors", []))


def main():
    q01, e01 = load(sys.argv[1])
    q1, e1 = load(sys.argv[2])
    rows = []
    for name in sorted(q01):
        if name not in q1:
            continue
        a, b = abs(q01[name]), abs(q1[name])
        rows.append((b / a if a > 0 else float("inf"), name, a, b))
    rows.sort(reverse=True)
    print("| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for r, name, a, b in rows[:25]:
        flag = " **superlinear**" if r > 10 else ""
        print(f"| {name} | {a:.2f} | {b:.2f} | {r:.1f}x{flag} |")
    ratios = [r for r, *_ in rows if r != float("inf")]
    ratios.sort()
    med = ratios[len(ratios) // 2]
    over = [n for r, n, *_ in rows if r > 10]
    t01 = sum(a for _, _, a, _ in rows)
    t1 = sum(b for _, _, _, b in rows)
    print(f"\ntotal: sf0.1 {t01:.1f}s -> sf1 {t1:.1f}s ({t1/t01:.2f}x for 10x data)")
    print(f"median ratio {med:.2f}x; >10x: {len(over)} {over}")
    print(f"errors: sf0.1 {sorted(e01)}; sf1 {sorted(e1)}")


if __name__ == "__main__":
    main()
