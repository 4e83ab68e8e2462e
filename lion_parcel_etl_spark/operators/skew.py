"""Skew mitigation: salted aggregation and salted replicated joins.

AQE's skew-join splitting (enabled engine-wide in session.py) handles
sort-merge join skew at runtime, but two shapes still need manual
salting at 100 TB:

- **aggregation skew** — a groupBy where a handful of hot keys own most
  rows serializes those keys onto single reducers. ``salted_aggregate``
  splits every hot key across ``buckets`` partial groups (map-side
  combine still applies) and re-aggregates the tiny partial table.
- **hot-key equi-join** — when the build side is too big to broadcast
  and one probe key dominates. ``salted_join`` salts the skewed side
  and replicates the other side ``buckets``× (explode of a literal
  range), so the hot key spreads over ``buckets`` reducers. Replication
  cost is |right| × buckets — use only when right ≪ left.

Both are pure plan transforms: deterministic, no RDDs, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def with_salt(df: DataFrame, buckets: int) -> DataFrame:
    """Deterministic per-row salt in [0, buckets): hash of the whole row
    (content-derived, so re-runs salt identically)."""
    return df.withColumn(SALT, F.pmod(F.xxhash64(*df.columns), F.lit(buckets)))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    agg_exprs: dict[str, tuple[str, Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``agg_exprs`` maps output name → (combiner, partial expression)
    where combiner is 'sum' | 'max' | 'min' (the algebraic aggregates
    that re-combine losslessly). Counts are sums of partial counts:
    pass ``("sum", F.count(F.lit(1)))``.
    """
    partial = with_salt(df, buckets).groupBy(*keys, SALT).agg(
        *[expr.alias(name) for name, (_, expr) in agg_exprs.items()]
    )
    combine = {"sum": F.sum, "max": F.max, "min": F.min}
    return partial.groupBy(*keys).agg(
        *[combine[comb](name).alias(name) for name, (comb, _) in agg_exprs.items()]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side
    replicated across all salt values. Result equals
    ``skewed.join(other, on, how)`` for how in {inner, left}."""
    s = with_salt(skewed, buckets)
    rep = other.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<bigint>"))
    )
    return s.join(rep, on=[*on, SALT], how=how).drop(SALT)
