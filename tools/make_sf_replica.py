"""Build a 10× replica of sf0.1 ("sf1") under .scratch/sf1 for the
anchor-set scale probe (r06 verdict item 9): turns the "would this
survive 10× more data" argument from structural to MEASURED for the
core query set, without touching the read-only driver testdata.

Replication scheme — facts grow 10×, dimensions stay fixed (the TPC-H
growth shape), and every copy lands in a DISJOINT key space so no
artificial cross-copy structure appears:

- lineitem / orders: orderkey += copy·1e6 (custkey/partkey/suppkey
  unchanged → each customer gets 10× the orders, dims keep their
  selectivity — real corpus growth, not a padded join explosion).
- events: event_id += copy·1e6, user_id += copy·10⁴ and the props
  ``{"k": N}`` key += copy·10³, so the user co-occurrence graph becomes
  10 disjoint copies (graph algorithms scale with honest 10× edges,
  not a densified mega-graph); timestamps unchanged → the daily series
  keep their |days| and grow 10× in volume, the realistic time-series
  growth.
- documents: doc_id += copy·1e5; copy>0 texts carry a per-copy salt
  token (the scale_smoke discipline) so near-dup structure is
  preserved without degenerate 10-way exact clusters.
- embeddings: vec_id += copy·1e5; copy>0 vectors perturb dim 0 by
  copy·1e-3 — near but not identical, so ANN/dedup keep realistic
  neighbor structure.
- region/nation/customer/supplier/part: copied verbatim.

``--skew`` (r08, verdict item 4) builds the HARD case for the graph
family instead of the disjoint-copies easy case (10 disjoint copies
leave arboricity unchanged, which BENCH_NOTES admits is friendly to
triangle_count's O(m^1.5) claim). Two deliberate pathologies in the
events table, everything else as in the plain replica:

- ONE HOT KEY: props key 0 is NOT shifted per copy, so its distinct
  user set grows 10× (≈7.3k users on one key vs ≈730 for every other
  key) — the co-occurrence projection's self-join gets one shuffle
  partition carrying ~deg²/2 ≈ 27M candidate pairs on its own, the
  classic skewed-join stress AQE's skew split exists for.
- ZIPF-ish USER POPULARITY: within each copy, user ids collapse into
  buckets of linearly growing width (width 1 + (u mod 10^4) div 300),
  so a tail of users absorbs up to ~5 users' events each — node
  degrees grow a heavy tail instead of staying uniform.

r09 (verdict item 3) extends ``--skew`` to the RELATIONAL core, which
had never been measured under a hot key:

- HOT CUSTOMER: 20% of orders (post-shift o_orderkey % 5 == 0) land
  on o_custkey = 1 — one mega-customer absorbing ~300k orders at sf1,
  the classic skewed groupBy/join key for the customer-keyed family
  (RFM, dormant, cohort) and the partition AQE's skew handling exists
  to split.
- HOT BASKET: lineitem rows with post-shift l_orderkey % 4999 == 0 (prime, so the copy shift
  does not re-select the same base orders in every copy)
  (~300 orders' items) collapse onto the single synthetic order key
  50,000,000 — one ~1,200-item basket next to a median of ~4, so the
  market-basket pair self-join gets one key carrying ~basket²/2 pair
  candidates and every lineitem-keyed shuffle gets a hot partition.

``--distinct`` (r09, verdict item 4) replaces the near-dup-PRESERVING
embedding perturbation (dim 0 += copy·1e-3, which keeps every vector
in a 10-way near-identical family and makes exact-dedup OUTPUT grow
~4.5× faster than data) with a family-BREAKING one: copy > 0 vectors
add copy·0.1 to the rotating dimension (copy mod 64). The exact-trio
ratio measured on this replica is the operators' true compute
exponent, separated from the output-growth artifact the plain replica
bakes in.

Usage: python tools/make_sf_replica.py [mult] [out_dir] [--skew] [--distinct]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lion_parcel_etl_spark.session import get_spark

SRC = "/root/testdata/sf0.1"


def main() -> None:
    skew = "--skew" in sys.argv
    distinct = "--distinct" in sys.argv
    args = [a for a in sys.argv[1:] if a not in ("--skew", "--distinct")]
    mult = int(args[0]) if len(args) > 0 else 10
    default_name = "sf1"
    if skew:
        default_name = "sf1skew"
    elif distinct:
        default_name = "sf1distinct"
    out = args[1] if len(args) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        default_name,
    )
    spark = get_spark(app_name="make-sf-replica")
    spark.sparkContext.setLogLevel("ERROR")
    copies = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("copy")

    def rep(table: str, df) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
        print(f"{table}: {spark.read.parquet(os.path.join(out, f'{table}.parquet')).count()} rows")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select("*", copies)
    li_key = F.col("l_orderkey") + F.col("copy") * 1_000_000
    if skew:
        # hot basket: ~1/4999 of orders' items collapse onto ONE
        # synthetic order key (out of every real copy's key space)
        li_key = F.when(li_key % 4999 == 0, F.lit(50_000_000)).otherwise(
            li_key
        )
    rep("lineitem", li.withColumn("l_orderkey", li_key).drop("copy"))
    o = spark.read.parquet(f"{SRC}/orders.parquet").select("*", copies)
    ox = o.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("copy") * 1_000_000
    )
    if skew:
        # hot customer: 20% of all orders land on custkey 1
        ox = ox.withColumn(
            "o_custkey",
            F.when(F.col("o_orderkey") % 5 == 0, F.lit(1)).otherwise(
                F.col("o_custkey")
            ),
        )
    rep("orders", ox.drop("copy"))
    ev = spark.read.parquet(f"{SRC}/events.parquet").select("*", copies)
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long")
    shifted_k = k + F.col("copy") * 1_000
    if skew:
        # key 0 stays key 0 in EVERY copy (the hot key); users collapse
        # into linearly-widening buckets (zipf-ish popularity tail)
        new_k = F.when(k == 0, F.lit(0)).otherwise(shifted_k)
        uid = F.col("user_id") + F.col("copy") * 10_000
        new_user = F.expr(
            "__uid - (__uid % (1 + ((__uid % 10000) div 300)))"
        )
    else:
        new_k = shifted_k
        uid = None
    evx = ev.withColumn(
        "event_id", F.col("event_id") + F.col("copy") * 1_000_000
    )
    if skew:
        evx = evx.withColumn("__uid", uid).withColumn(
            "user_id", new_user
        ).drop("__uid")
    else:
        evx = evx.withColumn("user_id", F.col("user_id") + F.col("copy") * 10_000)
    rep(
        "events",
        evx.withColumn(
            "props",
            F.when(
                F.col("props").isNotNull(),
                F.concat(
                    F.lit('{"k": '), new_k.cast("string"), F.lit("}")
                ),
            ),
        )
        .drop("copy"),
    )
    docs = spark.read.parquet(f"{SRC}/documents.parquet").select("*", copies)
    rep(
        "documents",
        docs.withColumn("doc_id", F.col("doc_id") + F.col("copy") * 100_000)
        .withColumn(
            "text",
            F.when(F.col("copy") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" v"), F.col("copy"))
            ),
        )
        .drop("copy"),
    )
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet").select("*", copies)
    if distinct:
        # family-BREAKING perturbation: +copy·0.1 in the rotating
        # dimension (copy mod 64) — large against unit-scale cosine,
        # so copies stop being near-dups of their source vector
        perturbed = F.transform(
            "embedding",
            lambda x, i: F.when(
                i == F.pmod(F.col("copy"), F.size("embedding")),
                x + F.col("copy").cast("double") * F.lit(0.1),
            ).otherwise(x),
        )
    else:
        # near-dup-PRESERVING perturbation (the plain/skew replicas):
        # dim 0 += copy·1e-3 — near but not identical
        perturbed = F.concat(
            F.array(
                F.element_at("embedding", 1)
                + F.col("copy").cast("float") * F.lit(0.001)
            ),
            F.slice("embedding", 2, 10_000),
        )
    rep(
        "embeddings",
        emb.withColumn("vec_id", F.col("vec_id") + F.col("copy") * 100_000)
        .withColumn(
            "embedding",
            F.when(F.col("copy") == 0, F.col("embedding"))
            .otherwise(perturbed)
            .cast("array<float>"),  # keep the source FLOAT[] schema
        )
        .drop("copy"),
    )
    for t in ["region", "nation", "customer", "supplier", "part"]:
        rep(t, spark.read.parquet(f"{SRC}/{t}.parquet"))
    print("done:", out)


if __name__ == "__main__":
    main()
