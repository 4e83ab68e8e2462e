"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (plus the training-data
operators); ``oracle_sql()`` gives the DuckDB-equivalent SQL for each.
The only entries without oracles are the approximate family —
``lsh_topk`` / ``ivf_topk`` / ``dedup_embedding_lsh`` (validated by
recall/equality against their exact twins in tests/test_similarity.py)
and ``approx_stats`` (sketch estimates, tolerance-checked in
tests/test_sketches.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lion_parcel_etl_spark.plans.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["pricing_summary"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (same column names/types)."""
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
