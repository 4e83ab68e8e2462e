"""Plan audit: dump the formatted physical plan of every registered
query and flag scale anti-patterns mechanically:

- parquet scans with no ReadSchema pruning (reading all columns),
- filters that did NOT reach the scan (missing PushedFilters),
- SortMergeJoin where one side could broadcast,
- CartesianProduct / BroadcastNestedLoopJoin (usually accidental),
- row-at-a-time Python UDFs (BatchEvalPython) in the plan.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
Writes plans to /tmp/lpe_plans/<name>.txt and prints a one-line verdict
per query.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from lion_parcel_etl_spark.plans.queries import QUERIES
from lion_parcel_etl_spark.session import get_spark


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan and name not in (
        "cosine_topk",
        "tfidf_topk",
        "bm25_rank",
        "histogram",
        "dormant_customers",
        "pq_topk",
        "lm_surprisal",
        "ivf_topk_seeded",
        "heavy_hitters_exact",
        "column_profile",
    ):
        # intentional BNLJs: cosine_topk broadcasts a tiny query set;
        # tfidf/bm25/histogram/dormant_customers cross-join a broadcast
        # ONE-ROW stats aggregate (N, avgdl, min/max, avg balance) — a
        # scalar fan-in, not a pair explosion; pq_topk cross-joins the
        # broadcast 16-row PQ codebook (encode + query lookup tables);
        # lm_surprisal cross-joins the broadcast ONE-ROW vocabulary size;
        # ivf_topk_seeded cross-joins the broadcast 16-row seed table;
        # heavy_hitters_exact cross-joins the broadcast ONE-ROW total-N;
        # column_profile crosses its two ONE-ROW stat aggregates
        flags.append("BNLJ")
    if "BatchEvalPython" in plan:
        flags.append("PY_UDF_ROW_AT_A_TIME")
    if "SortMergeJoin" in plan and name not in ("pagerank", "snapshot_diff"):
        # pagerank's per-iteration join is SMJ BY DESIGN: both sides
        # are pinned hash-partitioned on the join key (exchange-free),
        # and the rank vector is |nodes|-sized — NOT broadcastable at
        # graph scale, so forcing BHJ would be the scale bug.
        # snapshot_diff (like full_outer_join, still flagged as the
        # known-justified sentinel) is a FULL-outer join: neither side
        # can be the build side, so SMJ is the only correct strategy.
        flags.append("SMJ")
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(
        app_name="plan-audit",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("/tmp/lpe_plans", exist_ok=True)
    for name, (fn, _) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            plan = formatted_plan(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {e}")
            continue
        with open(f"/tmp/lpe_plans/{name}.txt", "w") as f:
            f.write(plan)
        flags = audit(name, plan)
        print(f"{'FLAG' if flags else 'ok  '} {name}: {', '.join(flags) or 'clean'}")


if __name__ == "__main__":
    main()
