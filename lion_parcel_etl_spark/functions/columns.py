"""Shared scalar column expressions (SURVEY.md §2.9 F-series).

Every helper is a pure JVM-side Catalyst expression — no UDFs — so it
inlines into whole-stage codegen and costs nothing extra at 100 TB.
Each one carries its DuckDB-oracle twin (either the same ANSI spelling
or a documented equivalent) so queries built from these helpers stay
hash-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed-width timestamp render used on both engines (micros; no tz
# representation leaks out). Duck twin: strftime(ts, TS_FMT_DUCK).
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"

# ISO-8601 with a COLON in the offset (+00:00), matching the reference's
# fmt_iso (public/lion_parcell_bonus_test_stg.py:240-246). `xxx` emits
# +00:00; `X` would emit `Z`.
ISO_OFFSET_FMT = "yyyy-MM-dd'T'HH:mm:ssxxx"


def cents(col: Column | str) -> Column:
    """Exact integer cents for a ≤2-decimal double.

    Summing these longs is order-free, so distributed accumulation can
    never flip a digit vs a single-node oracle (the *cents trick*).
    Duck twin: ``CAST(round(x*100) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def fmt_ts(col: Column | str) -> Column:
    """Render a timestamp to the fixed-width micros format."""
    return F.date_format(col, TS_FMT_SPARK)


def fmt_iso_offset(col: Column | str) -> Column:
    """Reference F6: ISO-8601 string with +00:00-style offset."""
    return F.date_format(col, ISO_OFFSET_FMT)


def md5_bigint(col: Column | str, hex_chars: int = 15) -> Column:
    """First ``hex_chars`` hex chars of md5 as a non-negative bigint.

    ≤15 chars keeps it under 2^60, always positive. Duck twin:
    ``('0x' || substr(md5(x), 1, n))::BIGINT`` (verified identical).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, hex_chars), 16, 10).cast("bigint")


def changed(a: Column | str, b: Column | str) -> Column:
    """Null-safe inequality (reference F4 ``IS DISTINCT FROM``,
    retail_transactions_scd.sql:65-68)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return ~ca.eqNullSafe(cb)


def any_changed(pairs: list[tuple[Column | str, Column | str]]) -> Column:
    """OR of null-safe inequalities over tracked column pairs — the
    SCD2 change-detection predicate shape."""
    out = F.lit(False)
    for a, b in pairs:
        out = out | changed(a, b)
    return out
