"""Multi-dimensional data layout: Z-order (Morton-curve) clustering.

``maintenance.compact(sort_by=...)`` gives range-clustered files whose
footer min/max stats prune scans on ONE column. A 100 TB fact table is
usually filtered on several (user AND day, part AND price band); a
linear sort clusters only its leading column, so trailing-column
predicates skip nothing. Z-ordering interleaves the bits of per-column
bucket numbers into one sort key, so files are clustered in ALL the
chosen dimensions at once — every column's min/max footer ranges stay
narrow, and any single- or multi-column predicate prunes files
(asserted against real parquet footers in tests/test_layout.py).

Public technique (Morton 1966; used by analytic stores widely —
ZORDER/cluster-by layout clauses). Everything here is JVM-side column
expressions: bucket → bit-interleave is ~bits×dims shift/or terms
inside whole-stage codegen, and the only exchange is the one
range-partitioning shuffle any clustering rewrite needs.

Bucketing uses fixed [lo, hi) linear ranges supplied by the caller or
measured in one tiny min/max aggregate. Linear ranges are
skew-sensitive; for skewed columns pass rank-based boundaries from
``approx_percentile`` instead (the boundaries argument accepts any
monotone bucket mapping via width_bucket semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lion_parcel_etl_spark.catalog import Warehouse

Z_COL = "__z"


def bucketize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map ``col`` linearly into [0, 2**bits) as a long (clamped)."""
    n = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(
        F.lit(n).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.floor(scaled * n).cast("long")),
    )


def interleave_bits(buckets: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of bucket j lands at position
    i*len(buckets)+j of the key. Pure shift/and/or expression tree."""
    dims = len(buckets)
    if bits * dims > 63:
        raise ValueError(
            f"interleave_bits: {bits} bits x {dims} columns = {bits * dims} "
            "key bits exceeds a long's 63 — negative Morton keys would "
            "invert the clustering order; lower bits or cluster fewer columns"
        )
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * dims + j))
    return out


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Z-order sort key over ``cols``. ``ranges`` gives [lo, hi) per
    column; missing ranges are measured with one min/max aggregate
    (a single tiny job — acceptable for a layout rewrite, or pass
    precomputed stats at 100 TB)."""
    ranges = dict(ranges or {})
    missing = [c for c in cols if c not in ranges]
    if missing:
        aggs = []
        for c in missing:
            aggs += [F.min(F.col(c).cast("double")).alias(f"{c}__lo"),
                     F.max(F.col(c).cast("double")).alias(f"{c}__hi")]
        row = df.agg(*aggs).first()
        for c in missing:
            lo, hi = row[f"{c}__lo"], row[f"{c}__hi"]
            # an all-null column has no range: treat as constant
            # (bucketize already maps hi <= lo to bucket 0)
            ranges[c] = (0.0, 0.0) if lo is None or hi is None else (lo, hi)
    buckets = [bucketize(F.col(c), ranges[c][0], ranges[c][1], bits) for c in cols]
    return interleave_bits(buckets, bits)


def zorder_compact(
    spark: SparkSession,
    wh: Warehouse,
    name: str,
    cols: list[str],
    n_files: int,
    bits: int = 8,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Rewrite table ``name`` into ``n_files`` Z-order-clustered files.

    One range-partitioning exchange on the Morton key + within-file
    sort; the key column is dropped before the write, so the layout is
    invisible to readers except through narrower footer stats."""
    df = wh.read(spark, name)
    z = zorder_key(df, cols, bits=bits, ranges=ranges)
    clustered = (
        df.withColumn(Z_COL, z)
        .repartitionByRange(n_files, Z_COL)
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
    )
    wh.overwrite(clustered, name)
