"""Shared JVM-side column-expression helpers."""

from lion_parcel_etl_spark.functions.columns import (
    ISO_OFFSET_FMT,
    TS_FMT_DUCK,
    TS_FMT_SPARK,
    any_changed,
    cents,
    changed,
    fmt_iso_offset,
    fmt_ts,
    md5_bigint,
)

__all__ = [
    "ISO_OFFSET_FMT",
    "TS_FMT_DUCK",
    "TS_FMT_SPARK",
    "any_changed",
    "cents",
    "changed",
    "fmt_iso_offset",
    "fmt_ts",
    "md5_bigint",
]
