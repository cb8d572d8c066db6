#!/usr/bin/env python3
"""Bench-diff harness (dev tool; the shipped library is pure Scala).

Diffs a fresh bench_out.json against a prior round's committed bench
file and prints a mechanical decomposition — the table PLANS.md lands
each round so "ambient drift" claims point at data, not prose.

Usage: python3 tools/benchdiff.py <new.json> <old.json> [--ratio 2.0] [--abs 0.5]

Accepts either the Bench.scala output shape ({"queries": {...}}) or the
driver's BENCH_r{N}.json wrapper (whose "tail" holds a truncated JSON
string — in that case pass the matching bench_out.json instead).

Prints: new-only queries (cost of the round's additions), removed
queries, carried queries whose delta exceeds EITHER threshold (ratio
or absolute seconds, both directions), and the total decomposition
new-total = old-total + additions + carried-drift.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d and isinstance(d["queries"], dict):
        return d["queries"]
    raise SystemExit(
        f"{path}: no 'queries' map — pass a bench_out.json, not the "
        f"driver's BENCH_r wrapper (its 'tail' is truncated)")


def main():
    args, ratio_thr, abs_thr = [], 2.0, 0.5
    toks = sys.argv[1:]
    i = 0
    while i < len(toks):
        if toks[i] in ("--ratio", "--abs"):
            if i + 1 >= len(toks):
                raise SystemExit(f"{toks[i]} requires a value\n{__doc__}")
            try:
                val = float(toks[i + 1])
            except ValueError:
                raise SystemExit(
                    f"{toks[i]} value {toks[i + 1]!r} is not a number\n"
                    f"{__doc__}")
            if toks[i] == "--ratio":
                ratio_thr = val
            else:
                abs_thr = val
            i += 2
        elif toks[i].startswith("--"):
            raise SystemExit(f"unknown flag {toks[i]}\n{__doc__}")
        else:
            args.append(toks[i]); i += 1
    if len(args) != 2:
        raise SystemExit(__doc__)
    new, old = load(args[0]), load(args[1])

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    carried = sorted(set(new) & set(old))

    add_cost = sum(new[q] for q in added)
    rem_cost = sum(old[q] for q in removed)
    drift = sum(new[q] - old[q] for q in carried)

    print(f"old total: {sum(old.values()):8.1f} s / {len(old)} queries")
    print(f"new total: {sum(new.values()):8.1f} s / {len(new)} queries")
    print(f"decomposition: +{add_cost:.1f} s new queries ({len(added)}), "
          f"-{rem_cost:.1f} s removed ({len(removed)}), "
          f"{drift:+.1f} s carried drift ({len(carried)} queries)")
    if added:
        print("\nnew queries (cost of the round's additions):")
        for q in sorted(added, key=lambda q: -new[q]):
            print(f"  {new[q]:7.2f} s  {q}")
    if removed:
        print("\nremoved queries:")
        for q in removed:
            print(f"  {old[q]:7.2f} s  {q}")

    flagged = []
    for q in carried:
        d = new[q] - old[q]
        r = new[q] / old[q] if old[q] > 0 else float("inf")
        if abs(d) > abs_thr or r > ratio_thr or (r > 0 and 1 / r > ratio_thr):
            flagged.append((d, r, q))
    if flagged:
        print(f"\ncarried queries over threshold (|Δ|>{abs_thr}s or "
              f"ratio>{ratio_thr}×), worst first:")
        print(f"  {'Δ sec':>8}  {'ratio':>6}  {'old':>7}  {'new':>7}  query")
        for d, r, q in sorted(flagged, key=lambda t: -abs(t[0])):
            print(f"  {d:+8.2f}  {r:5.2f}x  {old[q]:7.2f}  {new[q]:7.2f}  {q}")
    else:
        print(f"\nno carried query moved more than {abs_thr}s or {ratio_thr}x.")


if __name__ == "__main__":
    main()
