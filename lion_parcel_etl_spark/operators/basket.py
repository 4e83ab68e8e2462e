"""Market-basket association rules over a deduped (order, part) basket
table — the ONE rule pipeline shared by the batch query
(plans/queries.q_market_basket) and the streaming twin
(streaming/jobs.stream_market_basket → read_market_basket), so the two
can't drift: the streaming read IS this function over the distinct-
merged basket log.

Reference analog: the retail-mart analytics the reference's domain
implies (``etl/`` staging models feed exactly this kind of readout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_rules(b: DataFrame, min_pairs: int, top: int) -> DataFrame:
    """Association rules from a DISTINCT (o, p) basket table: for part
    pairs co-purchased in ≥ ``min_pairs`` orders, support / directional
    confidence / lift, top ``top`` by lift. All ratios derive from
    exact integer counts (pair count, per-item order counts, total
    orders), so everything replays bit-for-bit in SQL.

    Scale shape (the q_market_basket ledger row): the pair stage is a
    self-join on the ORDER key — per-key fanout is the basket size, so
    join output is Σ basket² ≈ corpus-linear, never |parts|²; item
    counts join back vocabulary-sized (AQE broadcasts); the order
    total is a broadcast 1-row scalar; top-k is a rounded total order
    (lift, pa, pb) so the LIMIT is deterministic. Callers hand in a
    PINNED basket table — it feeds four consumers."""
    item = b.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    no = b.agg(F.count_distinct("o").alias("n_orders"))
    a, c = b.alias("a"), b.alias("c")
    pairs = (
        a.join(c, (F.col("a.o") == F.col("c.o")) & (F.col("a.p") < F.col("c.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("c.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("pc"))
        .filter(F.col("pc") >= min_pairs)
    )
    j = (
        pairs.join(
            item.select(F.col("p").alias("pa"), F.col("cnt").alias("cnt_a")),
            "pa",
        )
        .join(
            item.select(F.col("p").alias("pb"), F.col("cnt").alias("cnt_b")),
            "pb",
        )
        .crossJoin(F.broadcast(no))
    )
    return (
        j.select(
            "pa",
            "pb",
            "pc",
            "cnt_a",
            "cnt_b",
            F.round(F.col("pc").cast("double") / F.col("n_orders"), 6).alias(
                "support"
            ),
            F.round(F.col("pc").cast("double") / F.col("cnt_a"), 6).alias(
                "conf_ab"
            ),
            F.round(F.col("pc").cast("double") / F.col("cnt_b"), 6).alias(
                "conf_ba"
            ),
            F.round(
                (F.col("pc").cast("double") * F.col("n_orders"))
                / (F.col("cnt_a").cast("double") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("pa").asc(), F.col("pb").asc())
        .limit(top)
    )
