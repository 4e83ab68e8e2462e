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
    """Association rules from an (o, p) basket table — duplicate rows
    tolerated (per-order dedup happens inside, so callers no longer
    pre-distinct): for part pairs co-purchased in ≥ ``min_pairs``
    orders, support / directional confidence / lift, top ``top`` by
    lift. All ratios derive from exact integer counts (pair count,
    per-item order counts, total orders), so everything replays
    bit-for-bit in SQL.

    Scale shape (the q_market_basket ledger row), reshaped in the r09
    optimization round: baskets collapse to ONE sorted distinct-part
    array per order (a single map-side-combined collect_set exchange —
    which also subsumes the callers' old pre-DISTINCT pass), and pairs
    explode from each array's ordered combinations instead of a
    self-join on the order key — same Σ basket² pair volume (a
    property of basket size, corpus-linear), but the exchange moves
    each order's parts ONCE instead of once per join side, and the
    (o, p)-distinct shuffle disappears outright (guide §2.4). Measured
    identical output vs the self-join at sf0.01/sf0.1 (oracle
    hash-green; the streaming-twin batch-agreement test pins the
    cross-batch split case). The basket table is pinned HERE — it
    feeds three consumers (pairs, item counts, order total)."""
    from lion_parcel_etl_spark.operators.dedup import pin

    baskets = pin(
        b.groupBy("o").agg(F.array_sort(F.collect_set("p")).alias("ps"))
    )
    item = (
        baskets.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    no = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps) - i - 1), "
                    "y -> struct(x AS pa, y AS pb))))"
                )
            ).alias("pr")
        )
        .select("pr.pa", "pr.pb")
        .groupBy("pa", "pb")
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
