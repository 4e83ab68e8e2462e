"""Bucketed co-located joins: plan-shape and correctness tests.

The scale claim under test (operators/bucketing.py): once two tables
are bucketed on the join key with the same bucket count, joining them
plans with ZERO Exchange nodes, while the identical join over plain
parquet needs a shuffle/broadcast. Correctness: the bucketed join
returns exactly the same rows as the plain join.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lion_parcel_etl_spark.operators.bucketing import (
    bucketed_join,
    exchange_count,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bucketed"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], 8, path=os.path.join(root, "o")
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        path=os.path.join(root, "l"),
    )
    yield orders, lineitem
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _no_broadcast(spark):
    return spark.conf.get("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    prev = _no_broadcast(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_lineitem", "b_orders", ["o_orderkey"])
        assert exchange_count(joined) == 0, "bucketed join must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_plain_join_does_exchange(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    prev = _no_broadcast(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = lineitem.withColumnRenamed("l_orderkey", "o_orderkey").join(
            orders, ["o_orderkey"]
        )
        assert exchange_count(plain) >= 2, "plain parquet join shuffles both sides"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    b = (
        bucketed_join(spark, "b_lineitem", "b_orders", ["o_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    p = (
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .join(orders, ["o_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    assert sorted(map(tuple, b.collect())) == sorted(map(tuple, p.collect()))


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    agg = (
        spark.table("b_lineitem")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert exchange_count(agg) == 0, "group-by on the bucket key must not shuffle"
