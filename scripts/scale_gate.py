#!/usr/bin/env python3
"""Scale-gate analysis: compare per-query bench JSONs across scale factors
and local-vs-forced-distributed runs.

Usage: scale_gate.py SF01.json SF1.json [DIST01.json DIST1.json]

Prints a markdown table (query, sf0.1 s, sf1 s, ratio) sorted by ratio,
flagging queries whose sf1 time exceeds 10x the sf0.1 time (superlinear
scaling for a 10x data increase) plus the gate summary. With the two DIST
files (same bench run under SPARK_GRAFT_MAX_EDGES=0, i.e. every adaptive
local/distributed split forced down the distributed branch), also prints the
local-vs-distributed table at both scales.
"""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    return d["queries"], set(d.get("errors", []))


def ratio_table(qa, qb, heads, cap=25, flag_over=10):
    rows = []
    for name in sorted(qa):
        if name not in qb:
            continue
        a, b = abs(qa[name]), abs(qb[name])
        rows.append((b / a if a > 0 else float("inf"), name, a, b))
    rows.sort(reverse=True)
    print(f"| query | {heads[0]} s | {heads[1]} s | ratio |")
    print("|---|---|---|---|")
    for r, name, a, b in rows[:cap]:
        flag = " **superlinear**" if flag_over and r > flag_over else ""
        print(f"| {name} | {a:.2f} | {b:.2f} | {r:.1f}x{flag} |")
    return rows


def summary(rows, heads, flag_over=10):
    ratios = sorted(r for r, *_ in rows if r != float("inf"))
    med = ratios[len(ratios) // 2]
    over = [n for r, n, *_ in rows if flag_over and r > flag_over]
    ta = sum(a for _, _, a, _ in rows)
    tb = sum(b for _, _, _, b in rows)
    print(f"\ntotal: {heads[0]} {ta:.1f}s -> {heads[1]} {tb:.1f}s "
          f"({tb/ta:.2f}x)")
    print(f"median ratio {med:.2f}x; >{flag_over}x: {len(over)} {over}")


def main():
    q01, e01 = load(sys.argv[1])
    q1, e1 = load(sys.argv[2])
    print("## Scale ratio (10x data, local branches where adaptive)\n")
    rows = ratio_table(q01, q1, ("sf0.1", "sf1"))
    summary(rows, ("sf0.1", "sf1"))
    print(f"errors: sf0.1 {sorted(e01)}; sf1 {sorted(e1)}")

    if len(sys.argv) > 4:
        d01, de01 = load(sys.argv[3])
        d1, de1 = load(sys.argv[4])
        print("\n## Forced-distributed (SPARK_GRAFT_MAX_EDGES=0) "
              "vs local, per scale\n")
        print("| query | local sf0.1 | dist sf0.1 | dist/local | "
              "local sf1 | dist sf1 | dist/local | dist sf1/sf0.1 |")
        print("|---|---|---|---|---|---|---|---|")
        for name in sorted(d01):
            if name not in d1 or name not in q01 or name not in q1:
                continue
            l01, l1 = abs(q01[name]), abs(q1[name])
            v01, v1 = abs(d01[name]), abs(d1[name])
            print(f"| {name} | {l01:.2f} | {v01:.2f} | {v01/l01:.1f}x | "
                  f"{l1:.2f} | {v1:.2f} | {v1/l1:.1f}x | {v1/v01:.1f}x |")
        drows = [(abs(d1[n]) / abs(d01[n]), n, abs(d01[n]), abs(d1[n]))
                 for n in sorted(d01) if n in d1 and abs(d01[n]) > 0]
        summary(drows, ("dist sf0.1", "dist sf1"))
        print(f"errors: dist sf0.1 {sorted(de01)}; dist sf1 {sorted(de1)}")


if __name__ == "__main__":
    main()
