from __future__ import annotations

import os

import pytest

from lion_parcel_etl_spark.operators.similarity import cosine_topk, lsh_topk

TD = "/root/testdata/sf0.001"
needs_td = pytest.mark.skipif(not os.path.isdir(TD), reason="testdata missing")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{TD}/embeddings.parquet").cache()


@needs_td
def test_cosine_topk_basic(spark, emb):
    queries = emb.filter("vec_id < 3")
    out = cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert len(rows) == 5
        sims = [r.cosine_sim for r in sorted(rows, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in rows)
        assert all(-1.0 <= s <= 1.0 for s in sims)


@needs_td
def test_self_similarity_is_one(spark, emb):
    # scoring a vector against a corpus containing itself ranks itself first
    queries = emb.filter("vec_id = 7")
    corpus = emb.withColumn("vec_id", emb.vec_id + 10000)  # avoid self-exclusion
    out = cosine_topk(corpus, queries, k=1).collect()
    assert out[0].neighbor_id == 10007
    assert abs(out[0].cosine_sim - 1.0) < 1e-6


@needs_td
def test_lsh_recall_against_brute_force(spark, emb):
    queries = emb.filter("vec_id < 10")
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = lsh_topk(emb, queries, dims=64, k=5, planes=6, tables=8).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # random gaussian vectors are a worst case for angular LSH; with
    # 8-table OR-amplification recall must still beat random (~1%) by far
    assert recall >= 0.3, f"LSH recall too low: {recall}"


@needs_td
def test_ivf_full_probe_equals_brute_force(spark, emb):
    from lion_parcel_etl_spark.operators.similarity import ivf_topk

    queries = emb.filter("vec_id < 5")
    exact = sorted(map(tuple, cosine_topk(emb, queries, k=5).collect()))
    ivf = sorted(
        map(tuple, ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=8).collect())
    )
    assert ivf == exact  # probing every inverted list IS brute force


@needs_td
def test_ivf_partial_probe_recall(spark, emb):
    from lion_parcel_etl_spark.operators.similarity import ivf_topk

    queries = emb.filter("vec_id < 10")
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=3).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.3, f"IVF recall too low: {recall}"
