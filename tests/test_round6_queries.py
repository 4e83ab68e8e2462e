"""Invariant tests for the round-6 eval/diagnostic queries
(quant_recall, dedup_pr_eval, acf_lags, vocab_kl). Value-level
equality vs DuckDB is covered by tools/check_oracles.py; these assert
the structural/semantic properties the oracles can't express —
admissibility orderings, estimator bounds, conservation laws.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lion_parcel_etl_spark.operators import dedup as DD
from lion_parcel_etl_spark.plans.queries import (
    ACF_MAX_LAG,
    ANN_RECALL_K,
    QUANT_BITS,
    _t,
    q_acf_lags,
    q_dedup_pr_eval,
    q_quant_recall,
    q_vocab_kl,
)


def test_quant_recall_shape_and_monotone(spark, sf_dir):
    rows = q_quant_recall(spark, sf_dir).collect()
    # one row per (bit width, query)
    assert len(rows) == len(QUANT_BITS) * 5
    by_method = {}
    for r in rows:
        assert 0 <= r.hits <= ANN_RECALL_K
        assert abs(r.recall - r.hits / ANN_RECALL_K) < 1e-9
        by_method.setdefault(r.method, []).append(r.recall)
    # more bits keep more of the float ranking: int8 mean recall must
    # dominate int4 (the whole point of the admissibility readout)
    mean = {m: sum(v) / len(v) for m, v in by_method.items()}
    assert mean["int8"] >= mean["int4"]
    # int8 is the production storage width — it must be admissible
    assert mean["int8"] >= 0.8


def test_dedup_pr_eval_counting_identities(spark, sf_dir):
    rows = {r.config: r for r in q_dedup_pr_eval(spark, sf_dir).collect()}
    assert set(rows) == {
        f"k{k}_b{b}" for k, b in [(DD.MINHASH_K, 4), (DD.MINHASH_K_CORPUS, DD.MINHASH_BANDS_CORPUS)]
    }
    for r in rows.values():
        assert r.tp <= min(r.n_cand, r.n_true)
        if r.n_cand:
            assert abs(r.precision - r.tp / r.n_cand) < 1e-9
        if r.n_true:
            assert abs(r.recall - r.tp / r.n_true) < 1e-9
    # same rows-per-band, 4x the bands => candidate set is a superset,
    # so recall cannot go down
    small = rows[f"k{DD.MINHASH_K}_b4"]
    big = rows[f"k{DD.MINHASH_K_CORPUS}_b{DD.MINHASH_BANDS_CORPUS}"]
    if small.n_true:
        assert big.recall >= small.recall


def test_acf_bounded_and_pair_counts(spark, sf_dir):
    df = q_acf_lags(spark, sf_dir).cache()
    rows = df.collect()
    assert rows
    # Cauchy-Schwarz: the expanded estimator never leaves [-1, 1]
    for r in rows:
        assert 1 <= r.lag <= ACF_MAX_LAG
        if r.acf is not None:
            assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9
    # a dense daily series loses exactly one pair per extra lag
    per = {}
    for r in rows:
        per.setdefault(r.event_type, {})[r.lag] = r.n_pairs
    for lags in per.values():
        for k in range(2, ACF_MAX_LAG + 1):
            assert lags[k] <= lags[k - 1]
    df.unpersist()


def test_vocab_kl_nonnegative_and_conserves_tokens(spark, sf_dir):
    df = q_vocab_kl(spark, sf_dir).cache()
    rows = df.collect()
    assert rows
    # KL(P || Q) >= 0, and source support is a subset of corpus
    # support so it is always finite
    for r in rows:
        assert r.kl_bits >= 0.0
        assert 0 < r.vocab <= r.n_tokens
    # per-source token counts add up to the corpus token count
    docs = _t(spark, sf_dir, "documents")
    total = docs.select(
        F.sum(F.size(DD.tokens(F.col("text")))).alias("t")
    ).first()[0]
    assert sum(r.n_tokens for r in rows) == total
    df.unpersist()


def test_seasonal_dow_residuals_sum_to_zero(spark, sf_dir):
    from lion_parcel_etl_spark.plans.queries import q_seasonal_dow

    rows = q_seasonal_dow(spark, sf_dir).collect()
    assert rows
    per = {}
    for r in rows:
        assert 0 <= r.dow <= 6
        per.setdefault(r.event_type, []).append((r.n_days, r.seasonal))
    # OLS with an intercept: residuals sum to zero, so the
    # day-count-weighted seasonal offsets must cancel per series
    for series in per.values():
        assert abs(sum(n * s for n, s in series)) < 1e-2


def test_market_basket_rule_bounds(spark, sf_dir):
    from lion_parcel_etl_spark.plans.queries import MB_TOP, q_market_basket

    rows = q_market_basket(spark, sf_dir).collect()
    assert 0 < len(rows) <= MB_TOP
    prev = None
    for r in rows:
        assert r.pa < r.pb
        assert r.pc <= min(r.cnt_a, r.cnt_b)
        assert 0 < r.support <= r.conf_ab <= 1.0
        assert 0 < r.conf_ba <= 1.0
        assert r.lift > 0
        if prev is not None:
            assert r.lift <= prev  # ordered by lift desc
        prev = r.lift


def test_kcenter_radius_non_increasing(spark, sf_dir):
    from lion_parcel_etl_spark.plans.queries import KCENTER_M, q_kcenter_select

    rows = sorted(q_kcenter_select(spark, sf_dir).collect(), key=lambda r: r.step)
    assert len(rows) == KCENTER_M
    assert rows[0].radius == 0.0
    assert len({r.vec_id for r in rows}) == KCENTER_M
    # greedy farthest-point: each new center is at most as far from the
    # selected set as the previous one was
    for a, b in zip(rows[1:], rows[2:]):
        assert b.radius <= a.radius + 1e-9


def test_rfm_segments_quintiles_and_labels(spark, sf_dir):
    from lion_parcel_etl_spark.plans.queries import q_rfm_segments

    rows = q_rfm_segments(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    for dim in ("r_score", "f_score", "m_score"):
        per = {}
        for r in rows:
            per[getattr(r, dim)] = per.get(getattr(r, dim), 0) + 1
        assert set(per) == {1, 2, 3, 4, 5}
        # ntile balance: bucket sizes differ by at most one
        assert max(per.values()) - min(per.values()) <= 1
        assert sum(per.values()) == n
    for r in rows:
        assert r.recency_days >= 0 and r.frequency >= 1 and r.monetary > 0
        if r.segment == "champion":
            assert r.r_score >= 4 and r.f_score >= 4 and r.m_score >= 4
        if r.segment == "hibernating":
            assert r.r_score <= 2 and r.f_score <= 2


def test_revenue_gini_bounds_and_degenerate_case(spark, sf_dir):
    from pyspark.sql import functions as F2

    from lion_parcel_etl_spark.plans.queries import q_revenue_gini

    rows = q_revenue_gini(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Gini of non-negative values lies in [0, 1); equal spends -> 0
        assert 0.0 <= r.gini < 1.0
        assert r.n_customers > 0 and r.total_revenue > 0
    # degenerate check against a hand-built frame: perfectly equal
    # spend must yield gini == 0 via the same rank formula
    eq = spark.createDataFrame(
        [(i, 500) for i in range(1, 6)], "custkey long, spend long"
    )
    from pyspark.sql import Window as W2

    w = W2.orderBy(F2.col("spend").asc(), F2.col("custkey").asc())
    g = (
        eq.select("spend", F2.row_number().over(w).cast("long").alias("i"))
        .agg(
            F2.count(F2.lit(1)).alias("n"),
            F2.sum("spend").alias("sx"),
            F2.sum(F2.col("i") * F2.col("spend")).alias("swx"),
        )
        .select(
            (
                (F2.lit(2.0) * F2.col("swx") - (F2.col("n") + 1) * F2.col("sx"))
                / (F2.col("n").cast("double") * F2.col("sx"))
            ).alias("gini")
        )
        .first()
    )
    assert abs(g.gini) < 1e-12


def test_seasonal_naive_eval_metric_bounds(spark, sf_dir):
    from lion_parcel_etl_spark.plans.queries import q_seasonal_naive_eval

    rows = q_seasonal_naive_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_days > 0
        assert r.mae >= 0.0
        assert r.mape is None or r.mape >= 0.0
        # sMAPE is bounded in [0, 2] by construction
        assert 0.0 <= r.smape <= 2.0


def test_daily_volumes_dense_per_series(spark, sf_dir):
    """ADVICE r06 → fixed structurally in r08: _daily_volumes now
    zero-fills each series' day span via the shared
    operators/temporal.densify_daily, so row-lag equals day-lag on ANY
    data. This test pins the spine's SEMANTICS (density is now an
    output guarantee, not an input assumption): every series covers
    every day in its span, and the dense frame's per-series totals
    equal the sparse aggregate's (zero rows added, none lost). The
    sparse end-to-end case (including the DuckDB mirror) is
    tests/test_round8_queries.py::test_lag_family_is_day_based_on_sparse_data."""
    from lion_parcel_etl_spark.plans.queries import _daily_volumes

    d = _daily_volumes(spark, sf_dir)
    gaps = (
        d.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (F.max("x") - F.min("x") + F.lit(1)).alias("span_days"),
        )
        .filter(F.col("n_days") != F.col("span_days"))
        .collect()
    )
    assert not gaps, f"densify_daily left gaps: {gaps}"
    assert d.filter("y < 0").count() == 0
    assert d.count() == d.select("event_type", "x").distinct().count()
