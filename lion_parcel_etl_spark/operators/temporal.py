"""Temporal joins Spark lacks as built-ins: as-of join and range join.

The reference has no temporal joins (SURVEY.md §2.4 — all its joins
are single-key equi-joins), but any event-stream analytics on the
engine needs them. Both are implemented as COMPOSITIONS of shuffle
operators Spark already optimizes — no UDFs, no driver loops — so
they inherit whole-stage codegen, AQE skew handling, and partial
aggregation for free.

as-of join — "attach the most recent right row at or before each left
row's timestamp, per key". The naive formulation is a non-equi join
(l.ts >= r.ts) + argmax, which Spark plans as a broadcast
nested-loop join: quadratic, dead at scale. Instead: union both
sides tagged, one window per key ordered by (ts, side) carrying
last(right_payload, ignoreNulls) forward, keep left rows. Exactly
ONE shuffle on the key — the same cost as an equi-join, at any
scale, and AQE's skew splitting still applies.

range join — "pair left rows with right intervals containing them".
The naive form is again a nested-loop join. Instead: discretize
time into fixed bins; each interval explodes to the bins it covers,
each point maps to one bin; equi-join on (key, bin); residual
filter exact containment. Each matching pair meets in exactly one
bin (the point's), so no dedup pass is needed. Bin width trades
join fan-out (intervals × bins-per-interval) against candidate
false positives within a bin; choose ~median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: per key, each left row gets the right row with
    the greatest ``right_ts <= left_ts`` (``direction='backward'``) or
    the least ``right_ts >= left_ts`` (``'forward'``). Ties on the
    timestamp itself match (inclusive, as DuckDB/pandas ASOF).

    Right payload columns (everything except ``by`` and ``right_ts``)
    come back suffixed; the matched right timestamp comes back as
    ``<right_ts><suffix>``. Rows with no match get nulls (left join
    semantics). Right side should be unique per (by, right_ts) — with
    duplicates, which duplicate wins is unspecified (same as DuckDB).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_ts = right_ts or left_ts
    rpay = [c for c in right.columns if c not in by and c != right_ts]
    out_cols = [f"{c}{suffix}" for c in rpay] + [f"{right_ts}{suffix}"]
    rtypes = {f.name: f.dataType for f in right.schema.fields}

    l2 = left.select(
        *left.columns,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(rtypes[c]).alias(f"{c}{suffix}") for c in rpay],
        F.lit(None).cast(rtypes[right_ts]).alias(f"{right_ts}{suffix}"),
    )
    lfill = [c for c in left.columns if c not in by]
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    r2 = right.select(
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lfill],
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rpay],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    ).select(l2.columns)  # align column order for unionByName-free union

    merged = l2.unionByName(r2)
    if direction == "backward":
        # right rows (__side=0) sort before left at equal ts → inclusive
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = merged.select(
            *left.columns,
            "__side",
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in out_cols],
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = merged.select(
            *left.columns,
            "__side",
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in out_cols],
        )
    return filled.filter(F.col("__side") == 1).drop("__side")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner join of point rows to every interval containing them
    (``start <= ts <= end``), optionally also keyed on ``by``.

    Discretized to ``bin_seconds`` buckets: an interval covering B
    bins produces B candidate rows, a point exactly one, and each true
    (point, interval) pair meets in exactly one bin — the shuffle is
    an equi-join on (by, bin) that AQE can split on skew, never a
    nested-loop. Pick ``bin_seconds`` near the median interval length:
    much smaller multiplies interval fan-out, much larger multiplies
    within-bin false candidates.
    """
    by = by or []
    binned_p = points.withColumn(
        "__bin", (F.unix_timestamp(point_ts) / F.lit(bin_seconds)).cast("long")
    )
    binned_i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_col) / F.lit(bin_seconds)).cast("long"),
                (F.unix_timestamp(end_col) / F.lit(bin_seconds)).cast("long"),
            )
        ),
    )
    return (
        binned_p.join(binned_i, [*by, "__bin"])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: list[str] | None = None,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner join of interval rows to every interval OVERLAPPING them
    (half-open semantics: [s1,e1) ∩ [s2,e2) ≠ ∅ ⟺ s1 < e2 ∧ s2 < e1),
    optionally also keyed on ``by`` — the interval-algebra sibling of
    :func:`range_join`.

    Same discretization idea, with one extra trick: two overlapping
    intervals share ALL the bins of their intersection, so a plain
    bin equi-join would emit the pair once per shared bin. Requiring
    the matched bin to equal ``greatest(start_bin_l, start_bin_r)`` —
    the FIRST shared bin — makes every true pair match exactly once,
    so no dedup exchange is needed at all. The shuffle is an equi-join
    on (by, bin), skew-splittable by AQE; fan-out per interval is its
    length in bins."""
    by = by or []

    def binned(df, start, end, tag):
        sb = (F.unix_timestamp(start) / F.lit(bin_seconds)).cast("long")
        eb = (F.unix_timestamp(end) / F.lit(bin_seconds)).cast("long")
        return df.withColumn(f"__sb_{tag}", sb).withColumn(
            "__bin", F.explode(F.sequence(sb, eb))
        )

    bl = binned(left, left_start, left_end, "l")
    br = binned(right, right_start, right_end, "r")
    return (
        bl.join(br, [*by, "__bin"])
        .filter(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            & (F.col("__bin") == F.greatest("__sb_l", "__sb_r"))
        )
        .drop("__bin", "__sb_l", "__sb_r")
    )
