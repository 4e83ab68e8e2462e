"""Round-10 optimization-round pins: store-accounting eviction, the
bucketed-table root keying, and the bench's builder-ownership map.

The r09 verdict's top item: ~12 HEADLINE rows timed a scan of their own
memoized session-store output. bench.py now evicts each store before
every run of its designated BUILDER query, so exactly one timed row
carries the build. These tests pin the eviction semantics that
accounting depends on.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_evict_keeps_builder_site_and_removes_path(spark):
    """_evict_session_store (r09 ADVICE): eviction must NOT disarm the
    duplicate-name collision guard, and must remove the on-disk
    parquet so a rebuild never depends on overwrite-same-path."""
    import lion_parcel_etl_spark.plans.queries as Q

    def build_a():
        return spark.range(3).toDF("n")

    def build_b():
        return spark.range(5).toDF("n")

    name = "evict_guard_test_r10"
    key = (spark.sparkContext.applicationId, "/x", name)
    try:
        assert Q._session_store(spark, "/x", name, build_a).count() == 3
        path = Q._SIG_STORE_MEMO[key]
        assert os.path.exists(path)
        Q._evict_session_store(spark, "/x", name)
        # on-disk store gone, memo gone ...
        assert not os.path.exists(path)
        assert key not in Q._SIG_STORE_MEMO
        # ... but the builder-site binding survives: a DIFFERENT call
        # site still cannot claim the evicted name
        with pytest.raises(ValueError, match="distinct store name"):
            Q._session_store(spark, "/x", name, build_b)
        # and the original site rebuilds cleanly
        assert Q._session_store(spark, "/x", name, build_a).count() == 3
    finally:
        Q._STORE_BUILDER_SITES.pop(name, None)
        p = Q._SIG_STORE_MEMO.pop(key, None)
        if p:
            import shutil

            shutil.rmtree(p, ignore_errors=True)


def test_bench_store_owners_map_to_real_stores(spark, sf_dir):
    """Every (owner query, store) pair in bench.STORE_OWNERS is real:
    the owner is a registered HEADLINE query, and running it
    materializes exactly the store names the bench will evict — a typo
    in either direction would silently turn the r10 accounting into a
    no-op (eviction of a nonexistent name) or leave a build untimed."""
    import bench
    import lion_parcel_etl_spark.plans.queries as Q

    app = spark.sparkContext.applicationId
    for owner, stores in bench.STORE_OWNERS.items():
        assert owner in bench.HEADLINE, owner
        assert owner in Q.QUERIES, owner
        fn, _ = Q.QUERIES[owner]
        fn(spark, sf_dir)  # building the stores is a call-time effect
        for store in stores:
            key = (app, str(sf_dir), store)
            assert key in Q._SIG_STORE_MEMO, (owner, store)
    # bucketed_join is owned via its separate memo
    assert "bucketed_join" in bench.HEADLINE
    bench._evict_owned(spark, sf_dir, "bucketed_join")
    assert app not in Q._BUCKETED_LAST


def test_evict_owned_forces_rebuild(spark, sf_dir):
    """bench._evict_owned makes the owner's next call rebuild its
    store from scratch (fresh on-disk parquet) — the property that
    puts the build inside the bench's timed region."""
    import bench
    import lion_parcel_etl_spark.plans.queries as Q

    fn, _ = Q.QUERIES["ks_drift"]
    fn(spark, sf_dir)
    key = (spark.sparkContext.applicationId, str(sf_dir), "ks_exact")
    path_before = Q._SIG_STORE_MEMO[key]
    mtime_before = max(
        os.path.getmtime(os.path.join(path_before, f))
        for f in os.listdir(path_before)
    )
    bench._evict_owned(spark, sf_dir, "ks_drift")
    assert key not in Q._SIG_STORE_MEMO
    assert not os.path.exists(path_before)
    fn(spark, sf_dir)
    path_after = Q._SIG_STORE_MEMO[key]
    mtime_after = max(
        os.path.getmtime(os.path.join(path_after, f))
        for f in os.listdir(path_after)
    )
    assert mtime_after >= mtime_before
    assert os.path.exists(path_after)


def test_bucketed_root_distinguishes_full_sf_dir(spark, sf_dir, tmp_path, monkeypatch):
    """r09 ADVICE (medium): the bucketed-table memo must key on the
    FULL sf_dir — two paths sharing a basename are different datasets.
    A call with an aliased path (same basename, different parent) must
    rewrite, not serve the other dataset's tables."""
    import lion_parcel_etl_spark.operators.bucketing as B
    import lion_parcel_etl_spark.plans.queries as Q

    calls = []
    real = B.write_bucketed

    def counting(df, table, keys, n, path):
        calls.append((table, path))
        return real(df, table, keys, n, path)

    monkeypatch.setattr(B, "write_bucketed", counting)
    key = spark.sparkContext.applicationId
    # an alias directory with the SAME basename pointing at the same
    # parquet data — under the old basename-derived root this memo-hit
    # and silently served the other path's tables
    alias_parent = tmp_path / "alias"
    alias_parent.mkdir()
    alias = alias_parent / os.path.basename(os.path.normpath(str(sf_dir)))
    alias.symlink_to(str(sf_dir))

    Q._BUCKETED_LAST.pop(key, None)
    try:
        Q.q_bucketed_join(spark, sf_dir)
        n_first = len(calls)
        assert n_first == 2  # orders + lineitem
        Q.q_bucketed_join(spark, sf_dir)
        assert len(calls) == n_first  # same full path: memo hit
        Q.q_bucketed_join(spark, str(alias))
        assert len(calls) == n_first + 2  # same basename, new path: rewrite
        # roots embed the applicationId (concurrent sessions cannot
        # clobber each other) and differ across the two sf_dirs
        roots = {os.path.dirname(p) for _, p in calls}
        assert len(roots) == 2
        for r in roots:
            assert key in os.path.basename(r)
    finally:
        Q._BUCKETED_LAST.pop(key, None)


def test_bench_guards_are_not_bare_asserts():
    """r09 ADVICE (low): the HEADLINE-uniqueness and kmax guards must
    survive python -O — i.e. be explicit raises, not asserts."""
    import ast
    import inspect

    import bench
    import lion_parcel_etl_spark.plans.queries as Q

    bench_src = inspect.getsource(bench)
    tree = ast.parse(bench_src)
    module_level_asserts = [
        n for n in tree.body if isinstance(n, ast.Assert)
    ]
    assert module_level_asserts == []
    kpr_src = inspect.getsource(Q.q_dedup_pr_eval)
    assert "assert kmax" not in kpr_src


def test_qc_model_store_scores_identical_to_inline_fit(spark, sf_dir):
    """r10: the fitted-weights store (qc_model) must reproduce the
    inline fit+score byte-for-byte — weights are raw doubles that
    parquet round-trips bit-exactly, and logreg_score consumes the
    dict sorted by bucket on both paths."""
    import lion_parcel_etl_spark.plans.queries as Q
    from lion_parcel_etl_spark.operators.classifier import (
        doc_features,
        logreg_fit,
        logreg_score,
    )
    from lion_parcel_etl_spark.operators.dedup import pin

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = pin(doc_features(docs, Q.QC_RULE_SPARK()))
    w = logreg_fit(feats, steps=Q.QC_STEPS, lr=Q.QC_LR)
    inline = logreg_score(feats, w)
    for name in ("qc_scored", "qc_model"):
        Q._evict_session_store(spark, sf_dir, name)
    stored = Q._qc_scored(spark, sf_dir)
    assert inline.count() == stored.count()
    assert inline.exceptAll(stored).count() == 0
    assert stored.exceptAll(inline).count() == 0
