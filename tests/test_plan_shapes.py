"""Physical-plan shape regression guards: the join strategies and
shuffle structure the SCALE.md notes promise must actually appear in
the plans — otherwise a refactor can silently turn a broadcast star
join into a sort-merge cascade and no value-level test would notice."""

from __future__ import annotations

import pytest

from lion_parcel_etl_spark.operators.bucketing import plan_string
from lion_parcel_etl_spark.plans.queries import (
    _build_pq_topk,
    q_exists_subquery,
    q_min_cost_supplier,
    q_nested_semi_join,
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
        # r09: q_pq_topk serves the family store — the ADC plan shape
        # lives in (and is guarded on) the inline build
        "pq_topk": plan_string(_build_pq_topk(spark, sf_dir)),
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


def test_dup_spans_shuffles_hashes_not_text(spark, sf_dir):
    """The one exchange must carry the 32-hex md5, never span text:
    hashing happens below the aggregate's partial side."""
    from lion_parcel_etl_spark.plans.queries import q_dup_spans

    import re

    plan = plan_string(q_dup_spans(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    # the exchange's input carries the 32-hex span_hash (plus partial
    # aggregate buffers) and NOT the raw span strings
    m = re.search(r"Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert m is not None, plan[:1500]
    inputs = m.group(1)
    assert "span_hash#" in inputs
    assert re.search(r"\bspan#\d+", inputs) is None, inputs


def test_pack_sequences_window_is_sharded(spark, sf_dir):
    """The packing window must partition by shard — a global
    (single-partition) window would serialize the corpus."""
    from lion_parcel_etl_spark.plans.queries import q_pack_sequences

    plan = plan_string(q_pack_sequences(spark, sf_dir))
    assert "hashpartitioning(shard" in plan, plan[:2000]
    assert "SinglePartition" not in plan


def test_snapshot_diff_single_join_no_python(spark, sf_dir):
    from lion_parcel_etl_spark.plans.queries import q_snapshot_diff

    import re

    plan = plan_string(q_snapshot_diff(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    # exactly ONE full-outer join node in the tree (tree header lines
    # carry a node id; the detail section repeats the name without one)
    assert len(re.findall(r"FullOuter \(\d+\)", plan)) == 1


def test_column_profile_two_hash_passes(spark, sf_dir):
    """Exactly two pruned scans (plain stats + distinct counts), and
    NO SortAggregate: mixing the string min/max buffers into the
    distinct pass would drag the whole Expand through a sort."""
    from lion_parcel_etl_spark.plans.queries import q_column_profile

    import re

    plan = plan_string(q_column_profile(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2
    # no Sort NODE anywhere: the global-agg SortAggregates have empty
    # grouping keys (nothing to sort); the regression this guards is a
    # Sort of the Expand output, which only appears when the string
    # min/max buffers land in the same aggregate as the distincts
    assert re.search(r"\bSort \(\d+\)", plan) is None


def test_bucketed_rank_is_single_scan(spark, sf_dir):
    """epoch_shuffle's two consumers (rank window + bucket counts)
    must share ONE exchange — the executed plan reuses the shuffle
    instead of scanning and md5-hashing the corpus twice. Guards the
    non-nullable bucket column (a nullable bucket lets the offsets
    join infer a null-filter into one branch's scan, breaking
    exchange identity) and the counts-from-windowed-side derivation."""
    import os

    from lion_parcel_etl_spark.operators.sampling import epoch_shuffle

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    df = epoch_shuffle(docs, "doc_id", epoch=1, buckets=16)
    df.collect()  # reuse is an AQE runtime decision: inspect the FINAL plan
    final = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final, "bucket-count branch no longer reuses the rank exchange"
    assert final.count("FileScan parquet") == 1, "input scanned more than once"


def test_bucketed_prefix_sum_is_single_scan(spark, sf_dir):
    """token_budget_select's two consumers (cumsum window + bucket
    totals/offsets) must share ONE exchange, exactly like
    _bucketed_rank — the offsets branch reads the WINDOWED side (max
    of the inclusive cumsum), so the executed plan reuses the shuffle
    instead of scanning and md5-hashing the corpus twice."""
    import os

    from pyspark.sql import functions as F

    from lion_parcel_etl_spark.operators.sampling import token_budget_select
    from lion_parcel_etl_spark.operators.text import token_count

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sized = docs.select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    df = token_budget_select(
        sized, "doc_id", "source", "n_tokens", budgets={}, default_budget=500,
        buckets=16,
    )
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final, "offsets branch no longer reuses the cumsum exchange"
    assert final.count("FileScan parquet") == 1, "input scanned more than once"
