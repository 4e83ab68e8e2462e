"""Physical-plan shape regression guards: the join strategies and
shuffle structure the SCALE.md notes promise must actually appear in
the plans — otherwise a refactor can silently turn a broadcast star
join into a sort-merge cascade and no value-level test would notice."""

from __future__ import annotations

import pytest

from lion_parcel_etl_spark.operators.bucketing import plan_string
from lion_parcel_etl_spark.plans.queries import (
    q_exists_subquery,
    q_min_cost_supplier,
    q_nested_semi_join,
    q_pq_topk,
    q_pricing_summary,
    q_star_join_revenue,
)


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    return {
        "pricing_summary": plan_string(q_pricing_summary(spark, sf_dir)),
        "star_join_revenue": plan_string(q_star_join_revenue(spark, sf_dir)),
        "exists_subquery": plan_string(q_exists_subquery(spark, sf_dir)),
        "nested_semi_join": plan_string(q_nested_semi_join(spark, sf_dir)),
        "min_cost_supplier": plan_string(q_min_cost_supplier(spark, sf_dir)),
        "pq_topk": plan_string(q_pq_topk(spark, sf_dir)),
    }


def test_no_cartesian_products_anywhere(plans):
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name


def test_no_row_at_a_time_python(plans):
    for name, plan in plans.items():
        assert "BatchEvalPython" not in plan, name


def test_star_join_broadcasts_every_dim(plans):
    plan = plans["star_join_revenue"]
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_semi_join_family_stays_hash_based(plans):
    for name in ("exists_subquery", "nested_semi_join"):
        plan = plans[name]
        assert "SortMergeJoin" not in plan, name
        assert "LeftSemi" in plan, name


def test_min_cost_supplier_dims_broadcast(plans):
    plan = plans["min_cost_supplier"]
    assert plan.count("BroadcastHashJoin") >= 3  # part, supplier, nation


def test_pricing_summary_is_single_agg_exchange(plans):
    plan = plans["pricing_summary"]
    # partial + final HashAggregate around exactly one shuffle
    assert plan.count("HashAggregate") >= 2
    assert "SortMergeJoin" not in plan


def test_pq_topk_single_code_join(plans):
    plan = plans["pq_topk"]
    # ADC is ONE broadcast hash join on (subspace, code), not m of them
    # (count tree lines, not the node-detail section repeats)
    assert plan.count("BroadcastHashJoin Inner") == 1
    assert "SortMergeJoin" not in plan
