"""Quiet-machine arbitration of registry-query isolated floors.

Generalizes tools/arbitrate_triangle.py (round 5) to ANY set of
registry queries: when a query's isolated floor moves between rounds
with NO plan change (the round-5 verdict flagged ``hashed_embedding``
1.48→2.43 s and ``pq_topk`` 1.48→2.16 s while the sweep's own loadavg
telemetry ramped 0.04→11.64), the repo rule says the move must be
arbitrated on a quiet machine before it can be called flat — or real.

Protocol (same as the triangle arbitration): one fresh Python+JVM per
(query, round), queries INTERLEAVED across rounds so slow machine
drift hits each query equally; per child one untimed warm-up
(Janino/JIT), then --runs timed runs against a cleared cache, plan
rebuilt inside the timed region exactly as bench.py does. Floors =
min across all rounds. The child row-counts its result so a silently
diverging plan would be caught, and records its own machine telemetry
so the artifact is self-arbitrating.

Usage:
    python tools/arbitrate.py --queries hashed_embedding,pq_topk
        [--runs 3] [--rounds 2] [--sf-dir /root/testdata/sf0.1]
        [--out /tmp/arb.json]

Run it on a QUIET machine (no concurrent Spark/DuckDB work).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = '''
import json, sys, time
sys.path.insert(0, "@@REPO@@")
from lion_parcel_etl_spark.plans.queries import QUERIES
from lion_parcel_etl_spark.session import get_spark

name, sf_dir, runs = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name=f"arb-{name}")
spark.sparkContext.setLogLevel("ERROR")
fn, _ = QUERIES[name]


def run():
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()


t0 = time.perf_counter()
run()
cold = time.perf_counter() - t0
n_rows = fn(spark, sf_dir).count()
times = []
for _ in range(runs):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    run()
    times.append(time.perf_counter() - t0)
print("ARB_RESULT " + json.dumps(
    {"cold": round(cold, 3), "times": [round(t, 3) for t in times],
     "rows": n_rows}
))
'''


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True, help="comma-separated registry names")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default="/tmp/arb.json")
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()
    queries = [q.strip() for q in args.queries.split(",") if q.strip()]

    sys.path.insert(0, REPO)
    import bench

    child_src = _CHILD.replace("@@REPO@@", REPO)
    raw: dict[str, list[float]] = {q: [] for q in queries}
    cold: dict[str, list[float]] = {q: [] for q in queries}
    rows: dict[str, set] = {q: set() for q in queries}
    telemetry: list[dict] = []
    for rnd in range(args.rounds):
        for q in queries:
            telemetry.append({"round": rnd, "query": q, **bench._machine_state()})
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, "-c", child_src, q, args.sf_dir, str(args.runs)],
                capture_output=True,
                text=True,
                timeout=args.timeout,
            )
            line = next(
                (
                    ln
                    for ln in proc.stdout.splitlines()
                    if ln.startswith("ARB_RESULT ")
                ),
                None,
            )
            if proc.returncode != 0 or line is None:
                print(f"{q} round {rnd}: FAILED\n{(proc.stderr or '')[-800:]}")
                return 1
            res = json.loads(line.split(" ", 1)[1])
            raw[q].extend(res["times"])
            cold[q].append(res["cold"])
            rows[q].add(res["rows"])
            telemetry[-1]["child_wall"] = round(time.time() - t0, 1)
            print(
                f"round {rnd} {q}: times {res['times']} cold {res['cold']} "
                f"rows {res['rows']}",
                flush=True,
            )

    out = {
        "sf_dir": args.sf_dir,
        "runs_per_child": args.runs,
        "rounds": args.rounds,
        "floors": {q: min(raw[q]) for q in queries},
        "raw": raw,
        "cold": cold,
        "rows": {q: sorted(rows[q]) for q in queries},
        "telemetry": telemetry,
        "machine_end": bench._machine_state(),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"floors": out["floors"], "rows": out["rows"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
