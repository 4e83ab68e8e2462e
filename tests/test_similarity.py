from __future__ import annotations

import os

import pytest

from lion_parcel_etl_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup,
    embedding_near_dup_lsh,
    lsh_topk,
)

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


@needs_td
def test_embedding_near_dup_matches_numpy(spark, emb):
    import numpy as np

    rows = sorted(emb.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id)
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    iu, ju = np.triu_indices(len(ids), 1)
    want = {
        (int(ids[i]), int(ids[j]))
        for i, j in zip(iu, ju)
        if round(S[i, j], 6) >= 0.35 or round(S[i, j], 5) == 0.35
    }
    # the numpy reference uses pairwise summation, so allow boundary
    # wobble at the 6th digit only for pairs sitting exactly on 0.35
    got_rows = embedding_near_dup(emb, threshold=0.35, n_blocks=5).collect()
    got = {(r.id_a, r.id_b) for r in got_rows}
    hard_want = {
        (int(ids[i]), int(ids[j]))
        for i, j in zip(iu, ju)
        if round(S[i, j], 6) >= 0.3500005
    }
    assert hard_want <= got <= want
    for r in got_rows:
        assert r.id_a < r.id_b
        assert -1.0 <= r.cosine_sim <= 1.0
    # pair set is independent of the blocking factor
    got3 = {(r.id_a, r.id_b) for r in embedding_near_dup(emb, threshold=0.35, n_blocks=3).collect()}
    assert got3 == got


def test_embedding_near_dup_chunk_cap_is_bit_exact(spark, emb, monkeypatch):
    """r08 VERDICT #6: the per-task scratch matrix is capped at
    MAX_BLOCK_ELEMS elements by chunking the left operand. A tiny cap
    (forcing many chunks, including step=1) must reproduce the default
    run BIT-IDENTICALLY — chunking rows changes no arithmetic — which
    pins both the cap wiring and the worst-case-bytes bound: no task
    can allocate a similarity matrix larger than the cap."""
    import lion_parcel_etl_spark.operators.similarity as S

    base = embedding_near_dup(emb, threshold=0.35, n_blocks=4).collect()
    monkeypatch.setattr(S, "MAX_BLOCK_ELEMS", 7)  # step = max(1, 7//|B|) = 1
    tiny = S.embedding_near_dup(emb, threshold=0.35, n_blocks=4).collect()
    assert sorted(map(tuple, tiny)) == sorted(map(tuple, base)) and base

    # the formula itself: chunk × |B| never exceeds the cap for any
    # realistic operand split
    for cap, lb in [(8_000_000, 1), (8_000_000, 125_000), (7, 50)]:
        step = max(1, cap // max(1, lb))
        assert step * lb <= max(cap, lb)  # lb > cap degenerates to 1 row


@needs_td
def test_embedding_near_dup_lsh_precision_and_recall(spark, emb):
    exact = embedding_near_dup(emb, threshold=0.35).collect()
    approx = embedding_near_dup_lsh(emb, threshold=0.35, dims=64).collect()
    exact_pairs = {(r.id_a, r.id_b): r.cosine_sim for r in exact}
    # precision is 1.0 by construction: every candidate is exactly
    # verified, so emitted pairs are a subset with identical sims
    for r in approx:
        assert (r.id_a, r.id_b) in exact_pairs
        assert r.cosine_sim == exact_pairs[(r.id_a, r.id_b)]
    recall = len(approx) / max(1, len(exact))
    # tau=0.35 is far from 1.0 (random-ish vectors): sign-LSH collision
    # prob per table is (1 - theta/pi)^6 ~ 0.054, OR over 8 tables ~ 0.36.
    # Genuinely-near duplicates (cos -> 1) are found with prob -> 1.
    assert recall >= 0.2, f"LSH near-dup recall too low: {recall}"


@needs_td
def test_pq_codes_shape_and_range(spark, emb):
    from lion_parcel_etl_spark.operators.similarity import pq_codes

    cb = emb.filter("vec_id < 16").selectExpr("vec_id AS code", "embedding AS cv")
    codes = pq_codes(emb, cb, m=8, dsub=8).cache()
    assert codes.count() == emb.count()
    for j in range(8):
        import pyspark.sql.functions as F

        bad = codes.filter((F.col(f"c{j}") < 0) | (F.col(f"c{j}") >= 16)).count()
        assert bad == 0
    # codebook vectors must encode to themselves in every subspace
    # (their subspace distance to themselves is exactly 0)
    own = codes.filter("vec_id < 16").collect()
    for r in own:
        assert all(r[f"c{j}"] == r.vec_id for j in range(8)), r
    codes.unpersist()


@needs_td
def test_pq_recall_against_brute_force(spark, emb):
    from lion_parcel_etl_spark.operators.similarity import pq_topk

    queries = emb.filter("vec_id < 10")
    # exact top-5 by L2 == top-5 by cosine only for normalized vectors;
    # compare against exact *L2* brute force computed in numpy instead
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    exact_pairs = set()
    for qi in range(10):
        q = M[ids == qi][0]
        d = ((M - q) ** 2).sum(axis=1)
        order = sorted(zip(d, ids), key=lambda t: (t[0], t[1]))
        top = [int(i) for dist, i in order if i != qi][:5]
        exact_pairs |= {(qi, n) for n in top}
    approx = pq_topk(emb, queries, n_codes=16, m=8, dsub=8, k=5).collect()
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # 16-entry sampled codebooks on gaussian data are coarse; PQ must
    # still far exceed random top-5 hit rate (~1%)
    assert recall >= 0.2, f"PQ recall too low: {recall}"


@needs_td
def test_ivf_seeded_full_probe_equals_brute_force(spark, emb):
    from lion_parcel_etl_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_seeded,
    )

    queries = emb.filter("vec_id < 5")
    exact = cosine_topk(emb, queries, k=5).collect()
    full = ivf_topk_seeded(emb, queries, n_centroids=16, nprobe=16, k=5).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(map(tuple, full), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, exact), key=lambda t: (t[0], t[3])
    )


@needs_td
def test_ivf_seeded_partial_probe_recall(spark, emb):
    from lion_parcel_etl_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_seeded,
    )

    queries = emb.filter("vec_id < 10")
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_seeded(emb, queries, n_centroids=16, nprobe=4, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"seeded-IVF recall too low: {recall}"


@needs_td
def test_codebooks_survive_non_dense_id_spaces(spark, emb):
    """Regression: pq_topk/ivf_topk_seeded built their codebook/seed
    set with filter(id < n), which silently EMPTIES the result for any
    id space that is not dense 0-based. The lowest-n-by-order
    semantics must give identical results under an id shift."""
    import pyspark.sql.functions as F

    from lion_parcel_etl_spark.operators.similarity import ivf_topk_seeded, pq_topk

    shifted = emb.withColumn("vec_id", F.col("vec_id") + 1000)
    for fn in (pq_topk, ivf_topk_seeded):
        base = fn(emb, emb.filter("vec_id < 5"))
        moved = fn(shifted, shifted.filter("vec_id < 1005"))
        got = sorted(
            (r[0] - 1000, r[1] - 1000, *r[2:]) for r in map(tuple, moved.collect())
        )
        want = sorted(map(tuple, base.collect()))
        assert got and got == want, fn.__name__


@needs_td
def test_ivf_refined_centroids_match_numpy_one_iteration(spark, emb):
    """The declarative (SQL-replayable) refinement must compute the
    same clusters-and-means as the numpy production path's single
    iteration — same seeds, same argmax, means equal to 1e-6 (the
    declarative side rounds there by design)."""
    import numpy as np

    from lion_parcel_etl_spark.operators.similarity import (
        ivf_centroids,
        ivf_refined_centroids,
    )

    C = ivf_centroids(emb, 16, refine_iters=1)
    got = {
        r.code: np.array(r.rv)
        for r in ivf_refined_centroids(emb, 16).collect()
    }
    # codes are the 16 lowest vec_ids, in id order = numpy row order
    codes = sorted(got)
    assert len(codes) == 16
    for row, code in enumerate(codes):
        assert np.allclose(got[code], C[row], atol=1.5e-6), (code, row)


@needs_td
def test_ivf_refined_full_probe_equals_brute_force(spark, emb):
    from lion_parcel_etl_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_refined,
    )

    queries = emb.filter("vec_id < 5")
    exact = sorted(map(tuple, cosine_topk(emb, queries, k=5).collect()))
    full = sorted(
        map(
            tuple,
            ivf_topk_refined(emb, queries, n_centroids=16, nprobe=16, k=5).collect(),
        )
    )
    assert full == exact


@needs_td
def test_ivf_refined_partial_probe_recall(spark, emb):
    from lion_parcel_etl_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_refined,
    )

    queries = emb.filter("vec_id < 10")
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_refined(emb, queries, n_centroids=16, nprobe=4, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"refined-IVF recall too low: {recall}"


@needs_td
def test_embedding_lsh_incremental_matches_full_run(spark, emb):
    """The embedding continuous-ingest path: incremental pairs against
    a vector store must equal the full LSH run restricted to pairs
    touching a new vector — same buckets, same verify."""
    from lion_parcel_etl_spark.operators.similarity import (
        embedding_near_dup_lsh,
        embedding_near_dup_lsh_incremental,
    )

    full = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_dup_lsh(emb, threshold=0.35, dims=64).collect()
    }
    expected = {p: s for p, s in full.items() if p[0] % 4 == 0 or p[1] % 4 == 0}
    assert expected, "split must produce cross pairs for the test to bite"
    got = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_dup_lsh_incremental(
            emb.filter("vec_id % 4 != 0"),
            emb.filter("vec_id % 4 = 0"),
            threshold=0.35,
            dims=64,
        ).collect()
    }
    assert got == expected


def test_quantize_embeddings_error_bound_and_guards(spark):
    """Dequantized values are within scale/(2*qmax) of the original
    per element; zero/empty vectors carry NULL qvec; the scale is the
    exact per-vector max|x|."""
    from lion_parcel_etl_spark.operators.similarity import quantize_embeddings

    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.003, 0.001, -0.002]),
        (3, [0.0, 0.0]),   # zero vector -> NULL qvec
        (4, []),           # empty -> NULL qvec
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert out[3]["qvec"] is None and out[4]["qvec"] is None
    assert out[3]["scale"] == 0.0 and out[4]["scale"] == 0.0
    import numpy as np

    for vid, vec in [(1, rows[0][1]), (2, rows[1][1])]:
        # the stored column is float32: compare against the values as
        # the engine actually holds them, not the Python doubles
        vec32 = [float(np.float32(x)) for x in vec]
        scale, qvec = out[vid]["scale"], out[vid]["qvec"]
        assert scale == max(abs(x) for x in vec32)
        assert all(-127 <= q <= 127 for q in qvec)
        for x, q in zip(vec32, qvec):
            assert abs(q * scale / 127.0 - x) <= scale / (2 * 127.0) + 1e-12


def test_quantized_vectors_preserve_topk_recall(spark, sf_dir):
    """Search quality survives int8 storage: exact cosine top-5 over
    DEQUANTIZED vectors recalls >= 90% of the top-5 over the original
    float32 vectors (8-bit symmetric quantization keeps relative
    angles; this is the guarantee that makes the storage layer safe
    to search directly)."""
    import os

    from lion_parcel_etl_spark.operators.similarity import (
        cosine_topk,
        quantize_embeddings,
    )

    import pyspark.sql.functions as F

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter("vec_id < 5")
    deq = (
        quantize_embeddings(emb)
        .select(
            "vec_id",
            F.transform(
                "qvec", lambda x: (x * F.col("scale") / F.lit(127.0)).cast("float")
            ).alias("embedding"),
        )
        .filter(F.col("embedding").isNotNull())
    )
    a = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    b = {(r.query_id, r.neighbor_id) for r in cosine_topk(deq, q, k=5).collect()}
    assert len(a & b) / len(a) >= 0.9


@needs_td
def test_semantic_dedup_matches_numpy_reference(spark, emb):
    """Assignment + within-cluster keep rule replayed row-by-row in
    numpy (same rounded cosines, same tie-breaks)."""
    import numpy as np

    from lion_parcel_etl_spark.operators.similarity import semantic_dedup

    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    V = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}

    def cos(a, b):
        na, nb = np.sqrt(a @ a), np.sqrt(b @ b)
        return round(float(a @ b) / (na * nb), 6) if na * nb > 0 else 0.0

    seeds = [r.vec_id for r in rows[:8]]
    assign = {}
    for vid, v in V.items():
        best = max(seeds, key=lambda s: (cos(v, V[s]), -s))
        assign[vid] = best
    dropped = set()
    for vid, v in V.items():
        for other, w in V.items():
            if other < vid and assign[other] == assign[vid] and cos(v, w) >= 0.35:
                dropped.add(vid)
                break

    out = semantic_dedup(emb, 0.35, n_centroids=8).collect()
    got_assign = {r.vec_id: r.cluster_id for r in out}
    got_dropped = {r.vec_id for r in out if not r.kept}
    assert got_assign == assign
    assert got_dropped == dropped


@needs_td
def test_semantic_dedup_total_and_layout_independent(spark, emb):
    from lion_parcel_etl_spark.operators.similarity import semantic_dedup

    a = {(r.vec_id, r.cluster_id, r.kept) for r in semantic_dedup(emb, 0.35).collect()}
    b = {
        (r.vec_id, r.cluster_id, r.kept)
        for r in semantic_dedup(emb.repartition(7), 0.35).collect()
    }
    assert a == b
    assert len(a) == emb.count()  # verdict for every vector, none lost
    # the lowest-id member of every cluster has no earlier cluster-mate
    lowest = {}
    for vid, cl, _ in sorted(a):
        lowest.setdefault(cl, vid)
    kept = {vid for vid, _, k in a if k}
    assert set(lowest.values()) <= kept


@needs_td
def test_semantic_dedup_threshold_monotone(spark, emb):
    """Raising the threshold can only keep MORE vectors (fewer pairs
    qualify as duplicates)."""
    from lion_parcel_etl_spark.operators.similarity import semantic_dedup

    loose = {r.vec_id for r in semantic_dedup(emb, 0.30).collect() if r.kept}
    tight = {r.vec_id for r in semantic_dedup(emb, 0.60).collect() if r.kept}
    assert loose <= tight


class TestJlProject:
    def test_matches_numpy_and_preserves_geometry(self, spark, sf_dir):
        import numpy as np

        from lion_parcel_etl_spark.operators.similarity import (
            jl_project,
            jl_signs,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
        rows = emb.collect()
        out = {r.vec_id: r.proj for r in jl_project(emb).collect()}
        M = np.array(jl_signs(16, 64))
        vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
        for vid, v in vecs.items():
            np.testing.assert_allclose(out[vid], M @ v, atol=2e-6)
        # JL property (loose at 16 dims): projected cosine tracks the
        # original ordering for a clearly-separated pair of pairs.
        ids = sorted(vecs)[:8]
        def cos(a, b):
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        orig = [(cos(vecs[a], vecs[b]), a, b) for a in ids for b in ids if a < b]
        orig.sort()
        lo, hi = orig[0], orig[-1]
        pa = {i: np.array(out[i]) for i in ids}
        assert cos(pa[hi[1]], pa[hi[2]]) > cos(pa[lo[1]], pa[lo[2]])


def test_embedding_lsh_index_path_equals_recompute(spark, emb, tmp_path):
    """Passing a persisted embedding_lsh_index table as store_index
    must produce exactly the pairs the recompute path produces — the
    index is a cache of the store's bucket rows, nothing more."""
    from lion_parcel_etl_spark.operators.similarity import (
        embedding_lsh_index,
        embedding_near_dup_lsh_incremental,
    )

    store = emb.filter("vec_id % 4 != 0")
    batch = emb.filter("vec_id % 4 = 0")
    want = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_dup_lsh_incremental(
            store, batch, threshold=0.35, dims=64
        ).collect()
    }
    path = str(tmp_path / "idx")
    embedding_lsh_index(store, dims=64).write.parquet(path)
    got = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_dup_lsh_incremental(
            None,
            batch,
            threshold=0.35,
            dims=64,
            store_index=spark.read.parquet(path),
        ).collect()
    }
    assert got == want and got


def test_embedding_lsh_index_stamp_rejects_mismatch(spark, emb, tmp_path):
    """ADVICE r06: an index built with different dims/planes/tables
    than the incremental call would silently bucket the batch under
    different hyperplanes. The index's parameter stamp (a marker
    column whose NAME carries the build parameters, validated from the
    schema alone) must fail fast on mismatch and accept a matching or
    legacy-unstamped index."""
    import pytest

    from lion_parcel_etl_spark.operators.similarity import (
        embedding_lsh_index,
        embedding_near_dup_lsh_incremental,
    )

    store = emb.filter("vec_id % 4 != 0")
    batch = emb.filter("vec_id % 4 = 0")
    path = str(tmp_path / "idx")
    embedding_lsh_index(store, dims=64, planes=6, tables=8).write.parquet(path)
    idx = spark.read.parquet(path)
    assert any(c.startswith("_lsh_d") for c in idx.columns)
    # mismatched planes: no job may run — ValueError at plan time
    with pytest.raises(ValueError, match="_lsh_d64_p6_t8"):
        embedding_near_dup_lsh_incremental(
            None, batch, dims=64, planes=8, store_index=idx
        )
    # matching parameters: accepted, stamp dropped from the plan
    out = embedding_near_dup_lsh_incremental(
        None, batch, threshold=0.35, dims=64, planes=6, tables=8,
        store_index=idx,
    )
    assert not any(c.startswith("_lsh_d") for c in out.columns)
    # legacy unstamped index: accepted as-is (back-compat)
    legacy = idx.drop(*[c for c in idx.columns if c.startswith("_lsh_d")])
    got = embedding_near_dup_lsh_incremental(
        None, batch, threshold=0.35, dims=64, store_index=legacy
    )
    assert got.count() == out.count()
