"""Salted aggregate/join must equal their unsalted plans exactly."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from lion_parcel_etl_spark.operators.skew import salted_aggregate, salted_join

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(EVENTS).cache()


def _cents(col):
    return F.round(col * 100).cast("long")


def test_salted_aggregate_equals_direct(spark, events):
    salted = salted_aggregate(
        events,
        ["event_type"],
        {
            "cents": ("sum", F.sum(_cents(F.col("value")))),
            "n": ("sum", F.count(F.lit(1))),
            "max_user": ("max", F.max("user_id")),
        },
        buckets=16,
    )
    direct = events.groupBy("event_type").agg(
        F.sum(_cents(F.col("value"))).alias("cents"),
        F.count(F.lit(1)).alias("n"),
        F.max("user_id").alias("max_user"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, direct.collect()))


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain(spark, events, how):
    dim = spark.createDataFrame(
        [("click", 1), ("purchase", 2)], ["event_type", "weight"]
    )
    salted = salted_join(events, dim, on=["event_type"], how=how, buckets=4)
    plain = events.join(dim, on="event_type", how=how)
    cols = ["event_id", "event_type", "weight"]
    assert sorted(
        map(tuple, salted.select(cols).collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    ) == sorted(
        map(tuple, plain.select(cols).collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )
