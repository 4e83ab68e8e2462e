"""Snapshot diff / CDC changelog generation.

The inverse of the repo's appliers: ``merge_upsert``/``scd2_apply``
consume change sets to maintain state; :func:`table_diff` PRODUCES the
change set between two table versions — the row-level
INSERT/UPDATE/DELETE changelog a downstream consumer (audit trail,
cache invalidation, incremental replication) needs when all it has is
periodic snapshots. The reference's dbt layer computes the same
classes of change implicitly inside its SCD2 model (reference
``models/scd/dim_transactions_scd.sql``); here it is a first-class
relational operator.

Scale shape: ONE full-outer join on the key columns — both snapshots
shuffle by key once (or zero times if both are bucketed/partitioned by
key, the recommended layout for snapshot tables); the null-safe
column comparison is a per-row expression. No window, no sort, no
driver state. NOCHANGE rows are dropped before anything else touches
them, so the output is |changes|, not |table|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """Changelog between two snapshots of the same keyed table.

    Returns one row per changed key with ``change_type`` ∈
    {INSERT, UPDATE, DELETE} plus, for every compared column ``c``,
    ``old_c`` and ``new_c`` (NULL on the absent side). Comparison is
    null-safe (NULL → NULL is no change); unchanged keys are omitted.
    The join itself is null-safe too, so a NULL key is a real key
    value (a NULL-keyed row on both sides compares as the same row) —
    which is why presence is detected with literal marker columns, not
    ``key IS NOT NULL``.
    """
    compare = (
        compare
        if compare is not None
        else [c for c in new.columns if c in set(old.columns) and c not in keys]
    )
    o = old.withColumn("__in_old", F.lit(True)).alias("o")
    n = new.withColumn("__in_new", F.lit(True)).alias("n")
    cond = None
    for k in keys:
        eq = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")

    in_old = F.coalesce(F.col("o.__in_old"), F.lit(False))
    in_new = F.coalesce(F.col("n.__in_new"), F.lit(False))
    changed = F.lit(False)
    for c in compare:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change_type = (
        F.when(~in_old, F.lit("INSERT"))
        .when(~in_new, F.lit("DELETE"))
        .when(changed, F.lit("UPDATE"))
        .otherwise(F.lit(None))
    )
    out_cols = [F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys]
    out_cols.append(change_type.alias("change_type"))
    for c in compare:
        out_cols.append(F.col(f"o.{c}").alias(f"old_{c}"))
        out_cols.append(F.col(f"n.{c}").alias(f"new_{c}"))
    return j.select(*out_cols).filter(F.col("change_type").isNotNull())


def apply_changelog(
    old: DataFrame,
    changes: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Replay a :func:`table_diff` changelog onto the old snapshot,
    reconstructing the new one: changed keys are removed from ``old``
    (one anti-join), then INSERT/UPDATE rows re-enter with their
    ``new_*`` values. ``apply_changelog(old, table_diff(old, new, k), k)``
    equals ``new`` on the key + compared columns — the roundtrip
    property tests/test_diff.py asserts, and the contract that lets a
    replication consumer maintain a replica from the change stream
    alone. Same scale shape as the diff: keyed joins only, output
    built without ever scanning ``new``."""
    compare = [c[len("new_"):] for c in changes.columns if c.startswith("new_")]
    upserts = changes.filter(F.col("change_type") != "DELETE").select(
        *keys, *[F.col(f"new_{c}").alias(c) for c in compare]
    )
    # NULL-SAFE anti-join: table_diff treats a NULL key as a real key
    # value, so the removal of changed keys must match it the same way
    # (a plain `on=keys` anti-join would never match a NULL key and
    # leave the old row behind next to its upserted replacement).
    ch = changes.select(*keys).alias("c")
    cond = None
    for k in keys:
        eq = F.col(f"t.{k}").eqNullSafe(F.col(f"c.{k}"))
        cond = eq if cond is None else cond & eq
    kept = old.select(*keys, *compare).alias("t").join(ch, cond, "left_anti")
    return kept.unionByName(upserts)
