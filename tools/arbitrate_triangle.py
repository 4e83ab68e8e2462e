"""Quiet-machine arbitration of triangle_count's plan variants.

Round 4 changed triangle_count twice at once (degree orientation AND
reduced pin placement) and its isolated floor moved 6.8 s → 9.1 s; the
round-4 verdict asked for a clean same-session side-by-side of the
three candidate plans so the pin placement is decided by measurement,
not attribution argument:

- ``id_all``  — round 3's plan: ID-oriented (a<b<c) wedge enumeration,
  caller-pinned edges, no internal pins (aac2db9).
- ``deg_all`` — degree-oriented with e + deg + oriented-edges all
  pinned (027d46f, the pre-tune round-4 state).
- ``deg_oe``  — degree-oriented with ONLY the oriented-edge table
  pinned (current operators/graph.triangle_counts).

Protocol: one fresh Python+JVM per (variant, round), variants
INTERLEAVED across rounds so slow machine drift hits each variant
equally; per child one untimed warm-up (Janino/JIT), then --runs timed
runs rebuilding the plan inside the timed region (pins re-materialize
exactly as in bench.py) against a cleared cache. Floors = min across
all rounds. The child also row-counts its result so a variant that
silently diverged would be caught.

Usage:
    python tools/arbitrate_triangle.py [--runs 3] [--rounds 2]
        [--sf-dir /root/testdata/sf0.1] [--out /tmp/triangle_arb.json]

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
import pyspark.sql.functions as F
from lion_parcel_etl_spark.operators import graph as G
from lion_parcel_etl_spark.operators.dedup import pin
from lion_parcel_etl_spark.plans.queries import (
    COOC_MIN_JACCARD,
    _user_key_rows,
)
from lion_parcel_etl_spark.session import get_spark

variant, sf_dir, runs = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name="triangle-arb")
spark.sparkContext.setLogLevel("ERROR")


def tri_id_all(edges):
    # round 3 (aac2db9): ID-oriented a<b<c enumeration, no internal pins
    e = edges.select("node_a", "node_b")
    wedge = e.join(
        e.select(F.col("node_a").alias("node_b"), F.col("node_b").alias("node_c")),
        "node_b",
    )
    tri = (
        wedge.alias("w")
        .join(
            e.select(F.col("node_a").alias("ca"), F.col("node_b").alias("cc")).alias("c"),
            (F.col("w.node_a") == F.col("c.ca")) & (F.col("w.node_c") == F.col("c.cc")),
        )
        .select("node_a", "node_b", "node_c")
    )
    corners = (
        tri.select(F.col("node_a").alias("node"))
        .unionAll(tri.select(F.col("node_b").alias("node")))
        .unionAll(tri.select(F.col("node_c").alias("node")))
    )
    tn = corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    deg = (
        e.select(F.col("node_a").alias("node"))
        .unionAll(e.select(F.col("node_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.filter(F.col("degree") >= 2).join(tn, "node", "left").select(
        "node",
        "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        F.round(
            F.lit(2.0) * F.coalesce("triangles", F.lit(0))
            / (F.col("degree") * (F.col("degree") - 1)),
            6,
        ).alias("clustering_coeff"),
    )


def tri_deg_all(edges):
    # pre-tune round 4 (027d46f): degree-oriented, e + deg + oe pinned
    e = pin(edges.select("node_a", "node_b"))
    deg = pin(
        e.select(F.col("node_a").alias("node"))
        .unionAll(e.select(F.col("node_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    oe = pin(G._degree_oriented(e, deg))
    tri = (
        G._oriented_wedges(oe)
        .alias("wg")
        .join(
            oe.select(F.col("src").alias("cv"), F.col("dst").alias("cw")).alias("c"),
            (F.col("wg.v") == F.col("c.cv")) & (F.col("wg.w") == F.col("c.cw")),
        )
        .select("u", "v", "w")
    )
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
    )
    tn = corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    degree = deg.select("node", F.col("d").alias("degree"))
    return degree.filter(F.col("degree") >= 2).join(tn, "node", "left").select(
        "node",
        "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        F.round(
            F.lit(2.0) * F.coalesce("triangles", F.lit(0))
            / (F.col("degree") * (F.col("degree") - 1)),
            6,
        ).alias("clustering_coeff"),
    )


BUILDERS = {
    "id_all": tri_id_all,
    "deg_all": tri_deg_all,
    "deg_oe": G.triangle_counts,
}


def build():
    edges = pin(
        G.cooccurrence_edges(
            _user_key_rows(spark, sf_dir),
            "k",
            "user_id",
            min_jaccard=COOC_MIN_JACCARD,
        )
    )
    return BUILDERS[variant](edges).orderBy("node")


def run():
    build().write.format("noop").mode("overwrite").save()


t0 = time.perf_counter()
run()
cold = time.perf_counter() - t0
n_rows = build().count()
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

VARIANTS = ["id_all", "deg_all", "deg_oe"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default="/tmp/triangle_arb.json")
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import bench

    child_src = _CHILD.replace("@@REPO@@", REPO)
    raw: dict[str, list[float]] = {v: [] for v in VARIANTS}
    cold: dict[str, list[float]] = {v: [] for v in VARIANTS}
    rows: dict[str, set] = {v: set() for v in VARIANTS}
    machine_start = bench._machine_state()
    for rnd in range(args.rounds):
        for v in VARIANTS:
            proc = subprocess.run(
                [sys.executable, "-c", child_src, v, args.sf_dir, str(args.runs)],
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
                print(f"{v} round {rnd}: FAILED\n{(proc.stderr or '')[-800:]}")
                return 1
            res = json.loads(line.split(" ", 1)[1])
            raw[v].extend(res["times"])
            cold[v].append(res["cold"])
            rows[v].add(res["rows"])
            print(
                f"round {rnd} {v}: times {res['times']} cold {res['cold']} "
                f"rows {res['rows']}",
                flush=True,
            )

    out = {
        "sf_dir": args.sf_dir,
        "runs_per_child": args.runs,
        "rounds": args.rounds,
        "floors": {v: min(raw[v]) for v in VARIANTS},
        "raw": raw,
        "cold": cold,
        "rows": {v: sorted(rows[v]) for v in VARIANTS},
        "machine": {"start": machine_start, "end": bench._machine_state()},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"floors": out["floors"], "rows": out["rows"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
