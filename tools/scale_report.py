"""Render the sf0.1 -> sfN scaling table from two bench JSON files.

Usage: python tools/scale_report.py small.json big.json [--factor 10]

Prints a markdown table: per-query seconds at both scales, the observed
ratio, and a flag when the ratio exceeds the linear budget (factor x a
noise allowance). Paste the output into BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument(
        "--allowance",
        type=float,
        default=1.5,
        help="single-machine noise multiplier on the linear budget",
    )
    args = ap.parse_args()
    small = json.load(open(args.small))
    big = json.load(open(args.big))

    print(f"| query | sf{small['sf']} s | sf{big['sf']} s | ratio | verdict |")
    print("|---|---|---|---|---|")
    flagged = []
    for name, s in small["queries"].items():
        b = big["queries"].get(name)
        if b is None:
            continue
        ratio = b / s if s > 0 else float("inf")
        # sub-second small-scale queries are dominated by fixed per-query
        # overhead (plan analysis, task launch); the linear budget applies
        # to data-driven cost, so give them the overhead term explicitly
        budget = args.factor * args.allowance * s + 0.5
        ok = b <= budget
        verdict = "linear" if ok else "SUPRALINEAR"
        if not ok:
            flagged.append(name)
        print(f"| {name} | {s:.2f} | {b:.2f} | {ratio:.1f}x | {verdict} |")
    print(
        f"| **total** | **{small['value']:.1f}** | **{big['value']:.1f}** | "
        f"**{big['value'] / small['value']:.1f}x** | "
        f"{'all linear' if not flagged else 'FLAGGED: ' + ', '.join(flagged)} |"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
