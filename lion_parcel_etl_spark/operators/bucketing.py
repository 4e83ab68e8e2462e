"""Bucketed tables: co-located, shuffle-free joins and aggregations.

The reference delegates all join planning to Postgres (SURVEY.md §4 —
its joins are ~20-row equi-joins). At 100 TB the dominant cost of a
repeated fact-fact equi-join (e.g. lineitem ⋈ orders on orderkey every
hour) is the shuffle of both sides. Bucketing is the Spark-native
answer: write each table hash-partitioned AND sorted by the join key
into N buckets once, and every subsequent join or aggregation on that
key reads the co-located buckets with NO Exchange and NO Sort in the
plan — the scan itself satisfies the join's required distribution.

This is the engine's "pre-partitioned mart" capability (SURVEY.md §7
build-order item 8: partition marts for scale). The write pays one
shuffle; every downstream consumer pays zero. At 1000 executors the
bucket count should be a multiple of the executor count (e.g. 4096)
so each scan task owns whole buckets.

Plan-shape guarantees are asserted in tests/test_bucketing.py via
``exchange_count`` below.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str],
    buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) parquet table.

    ``saveAsTable`` is required — bucket metadata lives in the session
    catalog, not in the parquet files — so ``path`` makes it an
    external table at that location. ``sort=True`` additionally sorts
    within each bucket file, which lets a later sort-merge join skip
    its Sort as well as its Exchange.
    """
    writer = df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.

    With both sides bucketed on ``keys`` into the same bucket count,
    Catalyst's EnsureRequirements sees the scans already satisfy the
    join's HashClusteredDistribution and inserts no Exchange; with
    bucket-sorted files it inserts no Sort either. One-file-per-bucket
    matters: more files per bucket forces a per-task merge-sort (still
    no shuffle).
    """
    return spark.table(left_name).join(spark.table(right_name), keys, how)


def plan_string(df: DataFrame) -> str:
    """The formatted physical plan as a string (pre-execution)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle or broadcast) nodes in the plan.

    The test oracle for "this join is co-located": a bucketed
    fact-fact join must plan with exchange_count == 0 while the same
    join over plain parquet plans with >= 2 (one per side, or one
    BroadcastExchange).
    """
    plan = plan_string(df)
    count = 0
    for line in plan.splitlines():
        parts = line.strip().split()
        # node-detail headers look like "(2) Exchange"
        if len(parts) >= 2 and parts[0].startswith("(") and parts[0].endswith(")"):
            if parts[1] in ("Exchange", "BroadcastExchange"):
                count += 1
    return count
