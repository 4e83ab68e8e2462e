"""JDBC source/sink builders: configuration correctness (no driver jar
in this environment, so .load()/.save() are not exercised)."""

from __future__ import annotations

import pytest

from lion_parcel_etl_spark.sources.jdbc import jdbc_reader, jdbc_replace_writer


def test_reader_requires_full_partition_spec(spark):
    with pytest.raises(ValueError):
        jdbc_reader(
            spark, "jdbc:postgresql://h/db", "t", partition_column="id"
        )


def test_reader_builds_with_partitioning(spark):
    r = jdbc_reader(
        spark,
        "jdbc:postgresql://h/db",
        "(select id, last_status from src) t",
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=8,
        pushDownPredicate="true",
    )
    assert r is not None  # options accepted; .load() needs a driver


def test_writer_caps_connections(spark):
    df = spark.range(100)
    w = jdbc_replace_writer(
        df, "jdbc:postgresql://h/db", "tgt", max_connections=2
    )
    assert w is not None
