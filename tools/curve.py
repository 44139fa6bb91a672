#!/usr/bin/env python3
"""Render the scaling-curve table from a Bench artifact.

Usage: python3 tools/curve.py [tools/bench_full_latest.json]

Reads the bench JSON (base + sf1/sf2/sf3 tiers) and prints the
warm-vs-warm per-decade exponent table as markdown:
e = log(time ratio) / log(data ratio), e <= 1 is linear-or-better.
The table is what PLANS.md carries by hand each round — this derives it
mechanically so round-over-round diffs don't depend on prose.
"""
import json
import math
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "tools/bench_full_latest.json"
    d = json.load(open(path))
    # prefer the dedicated warm-base re-run (round 6+ artifacts): the
    # full-registry pass's time for a seam-producing query includes its
    # seam build and is not a warm number
    base = dict(d.get("queries", {}))
    base.update(d.get("warm_base", {}))
    tiers = []  # (label, factor, warm_map) with base as factor 1
    tiers.append(("base", 1, base))
    for t in ("sf1", "sf2", "sf3"):
        if t in d and "warm" in d[t]:
            tiers.append((t, d[t]["factor"], d[t]["warm"]))
    if len(tiers) < 2:
        print("no scale tiers in artifact")
        return
    # queries present in the outermost tier drive the rows; inner tiers
    # may carry more (sf1/sf2 run the full heavy set, sf3 only four)
    names = sorted(set().union(*[set(t[2]) for t in tiers[1:]]))
    head = ["query"]
    for label, factor, _ in tiers:
        head.append(f"warm@{factor}x" if label != "base" else "warm@base")
    for i in range(1, len(tiers)):
        head.append(f"e ({tiers[i-1][1]}x->{tiers[i][1]}x)")
    print("| " + " | ".join(head) + " |")
    print("|" + "---|" * len(head))
    for n in names:
        row = [n]
        for _, _, warm in tiers:
            row.append(f"{warm[n]:.2f} s" if n in warm else "—")
        for i in range(1, len(tiers)):
            a, b = tiers[i - 1][2].get(n), tiers[i][2].get(n)
            fa, fb = tiers[i - 1][1], tiers[i][1]
            if a and b and a > 0 and b > 0:
                row.append(f"{math.log(b / a) / math.log(fb / fa):.2f}")
            else:
                row.append("—")
        print("| " + " | ".join(row) + " |")
    skipped = {t: d[t].get("skipped", []) for t in ("sf1", "sf2", "sf3") if t in d}
    for t, s in skipped.items():
        if s:
            print(f"\nskipped@{t}: {', '.join(s)}")


if __name__ == "__main__":
    main()
