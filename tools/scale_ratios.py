"""Join the sf0.1 isolated-floor ledger with an sf1 (10×-data) sweep and
emit the measured scale ratio per query — the r07 verdict's stretch
item 9: "turns every SCALE.md prose row into a measured exponent".

ratio = floor(sf1) / floor(sf0.1) for 10× the fact data. Reading guide:
  ratio ≤ ~1.5   fixed-cost / output-bounded (sketches, top-k, scalars)
  ratio ≈ 3-4    typical: 10× rows at 32 fixed cores with fixed
                 overheads amortized (the anchor-set r07 mean was 3.31×)
  ratio ≈ 10     honestly linear in corpus bytes (per-row folds)
  ratio > 10     SUPER-LINEAR — a plan fix or a documented justification
                 is required (output growth, e.g. a grid × users, counts
                 as justification only if SCALE.md says so)

Usage:
    python tools/scale_ratios.py [sf1_ledger] [sf01_ledger] [out_md]
Defaults: BENCH_SF1_FULL_r08.json, BENCH_ISOLATED.json, SCALE_RATIOS_r08.md
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf1_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_SF1_FULL_r08.json"
    )
    sf01_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_ISOLATED.json"
    )
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "SCALE_RATIOS_r08.md"
    )
    sf1 = json.load(open(sf1_path))
    sf01 = json.load(open(sf01_path))
    rows = []
    for name, f1 in sorted(sf1["floors"].items()):
        f0 = sf01["floors"].get(name)
        if not f0:
            continue
        rows.append((f1 / f0, name, f0, f1))
    rows.sort(reverse=True)
    missing = sorted(set(sf01["floors"]) - set(sf1["floors"]))
    errors = sf1.get("errors", {})
    with open(out_path, "w") as f:
        f.write(
            "# Measured 10x-data scale ratios (sf1 replica vs sf0.1 "
            "isolated floors)\n\n"
            f"Source ledgers: `{os.path.basename(sf1_path)}` (sf1) vs "
            f"`{os.path.basename(sf01_path)}` (sf0.1); fresh-JVM floors, "
            "min of 2 timed runs each. Anchor-set context: the r07 probe "
            "read 3.31x mean for the 24-anchor core; >10x = super-linear, "
            "requires a plan fix or documented output-growth "
            "justification.\n\n"
            "| ratio | query | sf0.1 floor (s) | sf1 floor (s) |\n"
            "|---|---|---|---|\n"
        )
        for ratio, name, f0, f1 in rows:
            flag = " **SUPER-LINEAR**" if ratio > 10 else ""
            f.write(f"| {ratio:.2f}x{flag} | `{name}` | {f0} | {f1} |\n")
        if errors:
            f.write("\nErrors during the sf1 sweep:\n\n")
            for name, err in sorted(errors.items()):
                f.write(f"- `{name}`: {err[:200]}\n")
        if missing:
            f.write(
                f"\nNot yet swept at sf1 ({len(missing)}): "
                + ", ".join(f"`{m}`" for m in missing)
                + "\n"
            )
    n_super = sum(1 for r in rows if r[0] > 10)
    print(
        f"wrote {out_path}: {len(rows)} ratios, {n_super} super-linear, "
        f"{len(errors)} errors, {len(missing)} missing"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
