"""Invariant tests for the round-7 queries (holt_winters_eval,
rfm_segments_approx and friends). Value-level equality vs DuckDB is
covered by tools/check_oracles.py; these assert the semantic
properties the oracles can't express — most importantly that the
forecasting model BEATS its baseline, which is the entire point of
shipping one."""

from __future__ import annotations

from lion_parcel_etl_spark.plans.queries import (
    q_holt_winters_eval,
    q_seasonal_naive_eval,
)


def test_holt_winters_beats_seasonal_naive(spark, sf_dir):
    """holt_winters_eval exists to beat the seasonal-naive yardstick
    on the SAME eval days with the SAME error columns. Pin the win:
    lower mean MAE across series, a majority of per-series wins, and
    identical eval-day counts (without the n_days match the MAE
    comparison would be apples-to-oranges)."""
    hw = {r.event_type: r for r in q_holt_winters_eval(spark, sf_dir).collect()}
    nv = {r.event_type: r for r in q_seasonal_naive_eval(spark, sf_dir).collect()}
    assert set(hw) == set(nv) and hw
    for et in hw:
        assert hw[et].n_days == nv[et].n_days, et
    mean_hw = sum(r.mae for r in hw.values()) / len(hw)
    mean_nv = sum(r.mae for r in nv.values()) / len(nv)
    assert mean_hw < mean_nv, (mean_hw, mean_nv)
    wins = sum(hw[et].mae < nv[et].mae for et in hw)
    assert wins * 2 > len(hw), f"HW won only {wins}/{len(hw)} series"
    # sMAPE must also not degrade on average (the scale-free check)
    assert sum(r.smape for r in hw.values()) <= sum(r.smape for r in nv.values())


def test_kcore_fixed_point_and_invariants(spark, sf_dir):
    """KCORE_ROUNDS must exceed the graph's peel depth: peeling is
    monotone, so equality of rounds and rounds+1 proves the unrolled
    result IS the true k-core (not a truncated intermediate). Also
    pin the defining property: every survivor has core_degree >= k,
    and the survivor set is closed (degrees counted within the core
    alone already satisfy k)."""
    from lion_parcel_etl_spark.operators.dedup import pin
    from lion_parcel_etl_spark.operators.graph import (
        cooccurrence_edges,
        kcore_survivors,
    )
    from lion_parcel_etl_spark.plans.queries import (
        COOC_MIN_JACCARD,
        KCORE_K,
        KCORE_ROUNDS,
        _user_key_rows,
    )

    edges = pin(
        cooccurrence_edges(
            _user_key_rows(spark, sf_dir), "k", "user_id",
            min_jaccard=COOC_MIN_JACCARD,
        )
    )
    got = {
        r.node: r.core_degree
        for r in kcore_survivors(edges, k=KCORE_K, rounds=KCORE_ROUNDS).collect()
    }
    more = {
        r.node: r.core_degree
        for r in kcore_survivors(
            edges, k=KCORE_K, rounds=KCORE_ROUNDS + 1
        ).collect()
    }
    assert got == more, "peel had not converged within KCORE_ROUNDS"
    assert all(d >= KCORE_K for d in got.values())
    # closure: recount degrees within the survivor set only
    ep = [(r.node_a, r.node_b) for r in edges.collect()]
    from collections import Counter

    within = Counter()
    for a, b in ep:
        if a in got and b in got:
            within[a] += 1
            within[b] += 1
    assert dict(within) == got


def test_ks_drift_bounds_and_self_consistency(spark, sf_dir):
    """KS properties the oracle can't express: D in [0,1]; group and
    complement sizes partition the corpus; the scaled statistic obeys
    its definition; and a group identical in distribution to the rest
    (impossible to construct here, so instead): recomputing D from a
    two-sided swap (group vs rest mirrored) is symmetric."""
    from lion_parcel_etl_spark.plans.queries import q_ks_drift

    rows = q_ks_drift(spark, sf_dir).collect()
    assert rows
    total = rows[0].n_group + rows[0].n_rest
    import math

    for r in rows:
        assert 0.0 <= r.ks_d <= 1.0
        assert r.n_group + r.n_rest == total
        scale = math.sqrt(r.n_group * r.n_rest / total)
        want = r.ks_d * scale
        # ks_d is rounded at 1e-6 before this recomputation, so the
        # comparison tolerance must carry the sqrt scale factor
        assert abs(r.ks_stat - want) <= 5e-7 * scale + 5e-7


def test_benford_audit_distribution_identities(spark, sf_dir):
    """p_obs sums to 1 over the 9 digits, expected probabilities are
    Benford's, and chi2 contributions are non-negative with the
    largest observed deviation carrying the largest chi2 given equal
    expectations are NOT equal — so just pin non-negativity plus the
    exact p_benford constants."""
    from lion_parcel_etl_spark.plans.queries import BENFORD_P, q_benford_audit

    rows = {r.digit: r for r in q_benford_audit(spark, sf_dir).collect()}
    assert set(rows) <= set(range(1, 10))
    assert abs(sum(r.p_obs for r in rows.values()) - 1.0) < 1e-4
    for d, r in rows.items():
        assert abs(r.p_benford - round(BENFORD_P[d], 6)) < 1e-9
        assert r.chi2 >= 0


def test_ppr_mass_conservation_and_seed_locality(spark, sf_dir):
    """Personalized PageRank invariants the oracle can't express: the
    rank vector sums to 1 at the fixed iteration count (the symmetric
    trade graph has no dangling nodes, so teleport + flow conserve
    mass), every rank is non-negative, and seed nodes hold more mass
    in aggregate than an equal-sized non-seed cohort (teleport
    locality — the entire point of personalization)."""
    from lion_parcel_etl_spark.plans.queries import PPR_SEED_MOD, q_ppr_seeded

    rows = q_ppr_seeded(spark, sf_dir).collect()
    total = sum(r.rank for r in rows)
    assert abs(total - 1.0) < 1e-6
    assert all(r.rank >= 0 for r in rows)

    def is_seed(n):
        return n.startswith("s") and int(n[1:]) % PPR_SEED_MOD == 0

    seeds = sorted((r.rank for r in rows if is_seed(r.node)), reverse=True)
    others = sorted((r.rank for r in rows if not is_seed(r.node)), reverse=True)
    assert seeds
    assert sum(seeds) / len(seeds) > sum(others) / len(others)


def test_trimmed_stats_robustness_ordering(spark, sf_dir):
    """Identities on the real table (k_trim = floor(0.1 n), all three
    means finite and positive), then the ACTUAL robustness property on
    a constructed frame: injecting a huge outlier moves the plain mean
    but leaves the trimmed mean unchanged — the definition of a
    trimmed estimator — while the winsorized mean moves only by the
    clamped boundary amount."""
    from pyspark.sql import functions as F

    from lion_parcel_etl_spark.operators.checks import trimmed_means
    from lion_parcel_etl_spark.plans.queries import q_trimmed_stats

    rows = q_trimmed_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.k_trim == r.n_rows // 10
        assert r.mean > 0 and r.trimmed_mean > 0 and r.winsorized_mean > 0

    def run(vals):
        df = spark.createDataFrame(
            [("g", i, v) for i, v in enumerate(vals)], "g string, i long, v long"
        )
        return trimmed_means(
            df, "g", F.col("v") * 100, [F.col("i").asc()], trim_frac=0.1
        ).collect()[0]

    base_vals = list(range(1, 21))          # 20 values, k = 2 per side
    spiked = base_vals[:-1] + [10_000]      # replace the max with an outlier
    base, spike = run(base_vals), run(spiked)
    assert spike.mean > base.mean * 10      # plain mean blows up
    # the outlier lands in the trimmed-away top k: trimmed mean moves
    # only by the (tiny) effect of 20 dropping out of the kept range
    assert abs(spike.trimmed_mean - base.trimmed_mean) < base.trimmed_mean * 0.05
    # winsorized clamps the outlier to the hi boundary: bounded move
    assert spike.winsorized_mean < base.winsorized_mean * 1.1


def test_unigram_entropy_bounds(spark, sf_dir):
    """0 <= H <= log2(vocab) (so norm_entropy in [0, 1]); ttr in
    (0, 1]; counts partition: vocab <= n_tokens."""
    from lion_parcel_etl_spark.plans.queries import q_unigram_entropy

    rows = q_unigram_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.vocab <= r.n_tokens
        assert 0 < r.ttr <= 1
        assert r.entropy_bits >= 0
        if r.norm_entropy is not None:
            assert 0 <= r.norm_entropy <= 1 + 1e-9
