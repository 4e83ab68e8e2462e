"""JDBC source/sink configuration (reference S1/K1-K2 literal mapping).

The reference extracts with pandas ``read_sql`` over a Postgres
connection and loads with ``to_sql(if_exists='replace', chunksize=10_000,
method='multi')`` (``public/source_transaction_lion_parcel.py:27-68``,
``public/lion_parcell_bonus_test_stg.py:262-287``). The engine's primary
catalog is the parquet ``Warehouse``, but deployments that must read or
write an operational RDBMS get the same semantics through Spark's JDBC
data source; these helpers centralize the scale-relevant options.

No JDBC driver jar ships in this environment, so the reader/writer
builders are constructed and tested for configuration only; ``load()``
is the caller's side.

Scale notes (the options that matter at real volume):
- reads parallelize ONLY with ``partitionColumn/lowerBound/upperBound/
  numPartitions`` — without them the whole table arrives through one
  task; ``pushDownPredicate`` (on by default) ships filters into the DB.
- writes batch per executor with ``batchsize`` (the ``chunksize=10_000``
  analog) and bound parallelism by the DataFrame's partition count —
  ``df.coalesce(n)`` before writing caps connections at n.
- ``truncate=true`` + mode("overwrite") reproduces K1's truncate-reload
  without dropping indexes/grants (vs pandas' drop-and-recreate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    **options: str,
) -> DataFrameReader:
    """Configured JDBC reader; caller runs ``.load()``.

    ``table`` may be a table name or a pushdown subquery alias
    (``"(select ...) t"``) — the reference's 7-column projection +
    ``current_timestamp`` extract (S1) is the subquery form.
    """
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound, num_partitions"
            )
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r


def jdbc_replace_writer(
    df: DataFrame,
    url: str,
    table: str,
    batch_size: int = 10_000,
    max_connections: int | None = None,
    **options: str,
) -> DataFrameWriter:
    """Configured truncate-reload JDBC writer (K1/K2); caller runs
    ``.save()``. ``max_connections`` caps write parallelism by
    coalescing the DataFrame first."""
    if max_connections is not None:
        df = df.coalesce(max_connections)
    w = (
        df.write.format("jdbc")
        .mode("overwrite")
        .option("url", url)
        .option("dbtable", table)
        .option("truncate", "true")
        .option("batchsize", str(batch_size))
    )
    for k, v in options.items():
        w = w.option(k, v)
    return w
