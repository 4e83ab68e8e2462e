"""Mechanical bench-regression detector: compare two BENCH_FULL.json
records (same scale factor: old round vs new round; or two scale
factors: growth-curve audit) and flag queries whose warm time moved
beyond the allowed factor — the "detect perf regressions mechanically
rather than by judge re-run" tool.

Usage:
  python tools/bench_compare.py OLD.json NEW.json [--max-ratio 1.5]
  python tools/bench_compare.py SF001.json SF01.json --growth

Same-scale mode flags NEW/OLD warm ratios above --max-ratio (default
1.5 — shared-session jitter on sub-second queries sits well under
this; see BENCH_NOTES.md "arbitration protocol" before trusting any
flag on a <0.5 s query). Floor-bounded: queries under --floor seconds
(default 0.3) are never flagged — at that size the measurement is
scheduling noise, not plan cost.

Growth mode compares across a 10x scale-factor step against the
family expectations in BENCH_NOTES.md: anything growing >5x for 10x
data (the worst expected family is the exact-percentile value-buffer
at ~4.6x) is flagged as super-linear.

Exit code 1 when anything is flagged, so a round script can gate on
it.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--max-ratio", type=float, default=1.5)
    ap.add_argument("--growth", action="store_true")
    ap.add_argument("--floor", type=float, default=0.3)
    args = ap.parse_args()

    old = json.load(open(args.old))["queries"]
    new = json.load(open(args.new))["queries"]
    limit = 5.0 if args.growth else args.max_ratio
    label = "growth (10x data)" if args.growth else "ratio (new/old)"

    flagged = []
    for name in sorted(set(old) & set(new)):
        a, b = old[name], new[name]
        if a < args.floor and b < args.floor:
            continue
        ratio = b / a if a > 0 else float("inf")
        if ratio > limit:
            flagged.append((name, a, b, ratio))

    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"dropped queries ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"new queries ({len(only_new)}): {', '.join(only_new)}")

    if not flagged:
        print(f"OK: no query exceeds {label} {limit}x "
              f"({len(set(old) & set(new))} compared)")
        return 0
    print(f"FLAGGED ({label} > {limit}x):")
    for name, a, b, r in sorted(flagged, key=lambda x: -x[3]):
        print(f"  {name}: {a:.3f}s -> {b:.3f}s ({r:.2f}x)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
