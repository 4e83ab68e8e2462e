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

Usage: python tools/make_sf_replica.py [mult] [out_dir] [--skew]
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
    args = [a for a in sys.argv[1:] if a != "--skew"]
    mult = int(args[0]) if len(args) > 0 else 10
    out = args[1] if len(args) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        "sf1skew" if skew else "sf1",
    )
    spark = get_spark(app_name="make-sf-replica")
    spark.sparkContext.setLogLevel("ERROR")
    copies = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("copy")

    def rep(table: str, df) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
        print(f"{table}: {spark.read.parquet(os.path.join(out, f'{table}.parquet')).count()} rows")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select("*", copies)
    rep(
        "lineitem",
        li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("copy") * 1_000_000
        ).drop("copy"),
    )
    o = spark.read.parquet(f"{SRC}/orders.parquet").select("*", copies)
    rep(
        "orders",
        o.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("copy") * 1_000_000
        ).drop("copy"),
    )
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
    rep(
        "embeddings",
        emb.withColumn("vec_id", F.col("vec_id") + F.col("copy") * 100_000)
        .withColumn(
            "embedding",
            F.when(F.col("copy") == 0, F.col("embedding"))
            .otherwise(
                F.concat(
                    F.array(
                        F.element_at("embedding", 1)
                        + F.col("copy").cast("float") * F.lit(0.001)
                    ),
                    F.slice("embedding", 2, 10_000),
                )
            )
            .cast("array<float>"),  # keep the source FLOAT[] schema
        )
        .drop("copy"),
    )
    for t in ["region", "nation", "customer", "supplier", "part"]:
        rep(t, spark.read.parquet(f"{SRC}/{t}.parquet"))
    print("done:", out)


if __name__ == "__main__":
    main()
