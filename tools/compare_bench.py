#!/usr/bin/env python3
"""Per-query scaling report between two Bench JSON lines.

Usage: compare_bench.py small.json big.json [factor]
       compare_bench.py scaling.jsonl [factor]

Two-file form compares the last JSON line of each file. One-file form
reads a multi-line jsonl (e.g. the committed BENCH_SCALING_r07.jsonl:
small-SF line first, big-SF line last) and compares the FIRST vs the
LAST line — append newer run pairs and it stays fresh.

Prints each query's time at both SFs and the scaling ratio big/small,
sorted by ratio descending, plus a summary. With a data-size `factor`
(default 10), flags queries whose ratio exceeds 2x the factor — the
VERDICT r6 superlinearity bar.
"""
import json
import sys


def load(path, line=-1):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[line])


def main():
    args = sys.argv[1:]
    if len(args) >= 2 and not args[1].replace(".", "").isdigit():
        small, big = load(args[0]), load(args[1])
        rest = args[2:]
    else:  # single jsonl holding both runs: first line vs last line
        with open(args[0]) as f:
            lines = f.read().strip().splitlines()
        if len(lines) < 2:
            sys.exit(f"{args[0]}: need >= 2 JSON lines (small-SF first, "
                     "big-SF last), got " + str(len(lines)))
        small, big = json.loads(lines[0]), json.loads(lines[-1])
        rest = args[1:]
    factor = float(rest[0]) if rest else 10.0
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(qs):
        if name not in qb:
            continue
        s, b = qs[name], qb[name]
        rows.append((name, s, b, b / s if s > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[3] > 2 * factor]
    print(f"{'query':32s} {'small_s':>8s} {'big_s':>8s} {'ratio':>7s}")
    for name, s, b, r in rows:
        mark = "  <-- SUPERLINEAR" if r > 2 * factor else ""
        print(f"{name:32s} {s:8.3f} {b:8.3f} {r:7.2f}{mark}")
    if not rows:
        print("no shared query names between the two bench lines")
        return
    tot_s = sum(qs[n] for n, *_ in [(r[0],) for r in rows])
    tot_b = sum(qb[r[0]] for r in rows)
    print(f"\n{len(rows)} queries; total {tot_s:.1f}s -> {tot_b:.1f}s "
          f"(ratio {tot_b / tot_s:.2f}x at {factor:.0f}x data)")
    geo = 1.0
    for _, _, _, r in rows:
        geo *= r
    geo **= 1.0 / len(rows)
    print(f"geometric-mean per-query ratio: {geo:.2f}x")
    print(f"flagged >2x-superlinear (ratio > {2 * factor:.0f}): "
          f"{[r[0] for r in flagged] or 'none'}")


if __name__ == "__main__":
    main()
