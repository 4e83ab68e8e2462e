"""Incremental rollup maintenance (operators/rollup.py): the merged
state must equal the single-shot aggregate regardless of how the input
is split into batches — the property that makes incremental
maintenance safe to deploy."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lion_parcel_etl_spark.operators.rollup import (
    rollup_finalize,
    rollup_merge,
    rollup_state,
)

ROWS = [
    # (key, value) with duplicate keys, negatives, and a null value
    ("a", 10.25), ("a", -3.5), ("b", 0.0), ("b", 7.77), ("b", 7.77),
    ("c", 100.01), ("a", None), ("d", -0.01),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def _single_shot(spark, rows):
    return rollup_finalize(
        rollup_state(_df(spark, rows), ["k"], {"m": F.col("v")}), ["k"]
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@settings(deadline=None, max_examples=20, suppress_health_check=list(HealthCheck))
@given(split=st.lists(st.integers(0, 2), min_size=len(ROWS), max_size=len(ROWS)))
def test_any_batch_split_matches_single_shot(spark, split):
    batches = [[], [], []]
    for row, b in zip(ROWS, split):
        batches[b].append(row)
    batches = [b for b in batches if b]
    if not batches:
        pytest.skip("empty split")
    state = rollup_state(_df(spark, batches[0]), ["k"], {"m": F.col("v")})
    for extra in batches[1:]:
        delta = rollup_state(_df(spark, extra), ["k"], {"m": F.col("v")})
        state = rollup_merge(state, delta, ["k"])
    assert _canon(rollup_finalize(state, ["k"])) == _canon(
        _single_shot(spark, ROWS)
    )


def test_merge_is_commutative(spark):
    s1 = rollup_state(_df(spark, ROWS[:4]), ["k"], {"m": F.col("v")})
    s2 = rollup_state(_df(spark, ROWS[4:]), ["k"], {"m": F.col("v")})
    ab = rollup_finalize(rollup_merge(s1, s2, ["k"]), ["k"])
    ba = rollup_finalize(rollup_merge(s2, s1, ["k"]), ["k"])
    assert _canon(ab) == _canon(ba)


def test_null_values_do_not_count(spark):
    out = _single_shot(spark, [("a", None), ("a", 2.0)]).collect()[0]
    assert out.m_cnt == 1 and out.m_sum == 2.0 and out.m_avg == 2.0


def test_all_null_group_has_null_avg(spark):
    out = _single_shot(spark, [("z", None)]).collect()[0]
    assert out.m_cnt == 0 and out.m_avg is None


def test_mismatched_state_columns_rejected(spark):
    s1 = rollup_state(_df(spark, ROWS[:4]), ["k"], {"m": F.col("v")})
    s2 = rollup_state(_df(spark, ROWS[4:]), ["k"], {"other": F.col("v")})
    with pytest.raises(ValueError):
        rollup_merge(s1, s2, ["k"])
