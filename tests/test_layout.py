"""Z-order layout (operators/layout.py): multi-dimensional clustering
must narrow parquet footer min/max ranges on EVERY clustered column —
checked against the real file footers, not asserted rhetorically."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lion_parcel_etl_spark.catalog import Warehouse
from lion_parcel_etl_spark.operators.layout import (
    interleave_bits,
    zorder_compact,
    zorder_key,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
N_FILES = 16


def _events(spark):
    ev = spark.read.parquet(EVENTS)
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev.select("event_id", "user_id", "value")


def _file_ranges(wh, name, col):
    """Per-parquet-file (min, max) of ``col`` from the footer stats."""
    out = []
    for f in sorted(glob.glob(os.path.join(wh.table_path(name), "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out.append((lo, hi))
    return out


def _overlap_frac(ranges, lo, hi):
    n = sum(1 for a, b in ranges if a is not None and not (b < lo or a > hi))
    return n / len(ranges)


def test_interleave_bits_known_values(spark):
    df = spark.range(1).select(
        interleave_bits([F.lit(0b101).cast("long"), F.lit(0b011).cast("long")], 3).alias("z")
    )
    # x=101, y=011 -> bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1 = 0b011011
    assert df.first().z == 0b011011


def test_zorder_narrows_footers_on_both_columns(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    ev = _events(spark).cache()
    n, total = ev.count(), ev.agg(F.sum("event_id")).first()[0]

    # linear baseline: range-clustered by user_id only
    wh.overwrite(
        ev.repartitionByRange(N_FILES, "user_id").sortWithinPartitions("user_id"),
        "linear",
    )
    # z-order on (user_id, value)
    wh.overwrite(ev, "zorder")
    zorder_compact(spark, wh, "zorder", ["user_id", "value"], n_files=N_FILES)

    # data unchanged by the rewrite
    got = wh.read(spark, "zorder")
    assert got.count() == n and got.agg(F.sum("event_id")).first()[0] == total

    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    u_lo, u_hi, v_lo, v_hi = stats
    u_band = (u_lo + (u_hi - u_lo) * 0.45, u_lo + (u_hi - u_lo) * 0.55)
    v_band = (v_lo + (v_hi - v_lo) * 0.45, v_lo + (v_hi - v_lo) * 0.55)

    # value-band predicate: the user-sorted layout cannot skip (value is
    # unclustered there); the z-ordered one must
    lin_v = _overlap_frac(_file_ranges(wh, "linear", "value"), *v_band)
    z_v = _overlap_frac(_file_ranges(wh, "zorder", "value"), *v_band)
    assert lin_v > 0.9, f"baseline unexpectedly clustered on value: {lin_v}"
    assert z_v < lin_v, f"z-order did not narrow value footers: {z_v} vs {lin_v}"
    assert z_v <= 0.75

    # user-band predicate must ALSO still prune under z-order
    z_u = _overlap_frac(_file_ranges(wh, "zorder", "user_id"), *u_band)
    assert z_u <= 0.75
    ev.unpersist()


def test_zorder_key_constant_range_is_safe(spark):
    df = spark.range(10).select(
        F.lit(5.0).alias("a"), (F.col("id") * 1.0).alias("b")
    )
    z = df.select(zorder_key(df, ["a", "b"], bits=4).alias("z"))
    vals = [r.z for r in z.collect()]
    assert len(vals) == 10 and all(v >= 0 for v in vals)


def test_zorder_all_null_column_treated_as_constant(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    df = spark.range(100).selectExpr(
        "id AS event_id", "id % 7 AS user_id", "CAST(NULL AS DOUBLE) AS value"
    )
    wh.overwrite(df, "t")
    zorder_compact(spark, wh, "t", ["user_id", "value"], n_files=4)
    assert wh.read(spark, "t").count() == 100


def test_interleave_bits_rejects_sign_bit_overflow(spark):
    import pytest as _pytest

    cols = [F.lit(1).cast("long")] * 8
    with _pytest.raises(ValueError):
        interleave_bits(cols, 8)  # 64 key bits > 63
