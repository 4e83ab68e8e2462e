"""Approximate/sketch aggregates: the sub-linear path for 100 TB.

Exact distinct counts and exact percentiles need a shuffle of every
distinct value (or a sort per group). At 100 TB that's the difference
between a 5-minute job and an impossible one. The sketch versions are
constant memory per group, one pass, and — critically — MERGEABLE:
per-partition (or per-day) sketches union into global answers without
rescanning, which is what makes incremental rollups work (compute
today's sketch, union with the stored one).

All built on Spark's JVM-side implementations (HLL++ for
approx_count_distinct, Apache DataSketches HLL for the binary
mergeable sketches, GK summaries for approx_percentile) — no Python
in the hot path. Accuracy bounds are tested against exact answers in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: str | Column, rsd: float = 0.02) -> Column:
    """HLL++ distinct-count estimate with target relative error."""
    return F.approx_count_distinct(col, rsd)


def approx_quantiles(col: str | Column, probs: list[float], accuracy: int = 10000) -> Column:
    """GK-summary percentile estimates; error <= 1/accuracy of rank."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(
        c, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
    )


def hll_rollup(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-key mergeable HLL sketches (DataSketches binary form).

    The stored-rollup pattern: materialize this per day/partition, and
    answer any coarser grain later by ``hll_union_agg`` over the
    sketch column — no rescan of the raw data. lg_k=12 → ~1.6 KB per
    sketch, ~1.6% standard error.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll")
    )


def hll_merge(rollup: DataFrame, keys: list[str]) -> DataFrame:
    """Union stored sketches up to a coarser grain and estimate."""
    agg = rollup.groupBy(*keys) if keys else rollup.groupBy()
    return agg.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx_distinct")
    )
