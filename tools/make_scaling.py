"""Regenerate SCALING.md's growth table from two bench JSON lines.

Usage: python tools/make_scaling.py BENCH_sf0.1.json BENCH_sf1.json

Prints the markdown table (all queries sorted by sf1 cost) plus the
header numbers; the commentary sections of SCALING.md are hand-written
around it (they interpret plans, not timings).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    qs, qb = small["queries"], big["queries"]
    common = [k for k in qb if k in qs]
    print(
        f"sf0.1 total: {small['value']} s over {len(qs)} queries; "
        f"sf1 total: {big['value']} s; "
        f"suite growth {big['value'] / small['value']:.1f}x"
    )
    print()
    print("| query | sf0.1 s | sf1 s | growth |")
    print("|---|---|---|---|")
    for k in sorted(common, key=lambda k: -qb[k]):
        print(f"| `{k}` | {qs[k]:.2f} | {qb[k]:.2f} | {qb[k] / qs[k]:.1f}x |")


if __name__ == "__main__":
    main()
