"""Similarity search over embedding columns (array<float>).

Two paths (BASELINE.json north_star):

- **cosine_topk** — exact brute-force top-k: broadcast the (small)
  query set, score every corpus vector with a JVM-side fold (zip_with +
  aggregate — no Python, no UDF), window top-k per query. At 100 TB
  this is one broadcast-join scan: linear, shuffle only for the final
  per-query top-k (tiny after map-side rank pruning).
- **lsh_topk** — approximate scale path: random-hyperplane signs give a
  b-bit bucket; candidates come from an equi-join on the bucket, then
  exact re-rank. Probing cost drops from |corpus| to the bucket size.

Norms/dot products fold left-to-right, matching the sequential order a
SQL oracle's list functions use, so scores are reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Self-matches (same id) are excluded. Ties broken by neighbor id so
    results are total-ordered and reproducible.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_digits).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank"))
    )


def plane_matrix(tables: int, planes: int, dims: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplane coefficients in
    [-0.5, 0.5): md5-derived, so every run (and every engine) builds
    the identical matrix — no RNG state to ship."""
    import hashlib

    rows = tables * planes
    out = np.empty((rows, dims), dtype=np.float64)
    for r in range(rows):
        for d0 in range(0, dims, 4):
            h = hashlib.md5(f"r{r}:d{d0}".encode()).digest()
            u = np.frombuffer(h, dtype=">u4").astype(np.float64)
            out[r, d0 : d0 + 4] = u[: min(4, dims - d0)] / 2**32 - 0.5
    return out


def lsh_buckets_udf(dims: int, planes: int, tables: int):
    """Vectorized bucket assignment: one Arrow batch → one numpy matmul.

    The column-expression alternative is a tables×planes×dims-term tree
    (thousands of scalar ops per row) that overwhelms whole-stage
    codegen; sign-of-projection is linear algebra, which is precisely
    the Pandas-UDF escape hatch's job. Returns array<long>, one bucket
    id per hash table.
    """
    M = plane_matrix(tables, planes, dims)  # (tables*planes, dims)
    weights = 1 << np.arange(planes, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        X = np.vstack(vecs.to_numpy())[:, :dims].astype(np.float64)
        bits = (X @ M.T > 0).astype(np.int64)  # (n, tables*planes)
        b = bits.reshape(len(X), tables, planes) @ weights  # (n, tables)
        return pd.Series(list(b))

    return buckets


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 1,
) -> np.ndarray:
    """IVF coarse quantizer: deterministic seeds (lowest-id vectors) +
    k-means refinement passes. Assignment is a distributed Arrow-batched
    argmax; the per-centroid means reduce through ``applyInPandas`` —
    only the (n_centroids × dims) centroid table ever reaches the
    driver, never corpus rows."""
    seeds = (
        corpus.orderBy(id_col).limit(n_centroids).select(vec_col).toPandas()[vec_col]
    )
    C = np.vstack(seeds.to_numpy()).astype(np.float64)
    for _ in range(refine_iters):
        assign = _assign_udf(C)

        def mean_vec(pdf: pd.DataFrame) -> pd.DataFrame:
            m = np.vstack(pdf["v"].to_numpy()).astype(np.float64).mean(axis=0)
            return pd.DataFrame({"cid": [int(pdf["cid"].iloc[0])], "mean": [m.tolist()]})

        means = (
            corpus.select(
                assign(F.col(vec_col)).alias("cid"), F.col(vec_col).alias("v")
            )
            .groupBy("cid")
            .applyInPandas(mean_vec, schema="cid int, mean array<double>")
            .collect()
        )
        for r in means:
            C[r["cid"]] = np.array(r["mean"])
    return C


def _assign_udf(centroids: np.ndarray, nprobe: int = 1):
    """array<int>: the ``nprobe`` nearest centroids by cosine (nprobe=1
    → scalar int for corpus-side assignment)."""
    Cn = centroids / (np.linalg.norm(centroids, axis=1, keepdims=True) + 1e-12)

    if nprobe == 1:

        @F.pandas_udf("int")
        def assign1(vecs: pd.Series) -> pd.Series:
            X = np.vstack(vecs.to_numpy()).astype(np.float64)
            Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
            return pd.Series(np.argmax(Xn @ Cn.T, axis=1).astype("int32"))

        return assign1

    @F.pandas_udf("array<int>")
    def assign_n(vecs: pd.Series) -> pd.Series:
        X = np.vstack(vecs.to_numpy()).astype(np.float64)
        Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
        order = np.argsort(-(Xn @ Cn.T), axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(order))

    return assign_n


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    inverted list; each query probes its ``nprobe`` closest lists and
    re-ranks exactly. nprobe = n_centroids degrades gracefully to exact
    brute force (tested). Probe cost ≈ nprobe/n_centroids of the corpus
    per query vs. all of it."""
    if centroids is None:
        centroids = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _assign_udf(centroids)(F.col(vec_col)).alias("cid"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(_assign_udf(centroids, nprobe)(F.col(vec_col))).alias("cid"),
    )
    scored = (
        c.join(F.broadcast(q), on="cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank"))
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 6,
    tables: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates share a hyperplane bucket in ANY of
    ``tables`` independent hash tables (OR-amplification), then exact
    cosine re-rank. More planes → smaller buckets (faster, lower
    recall); more tables → higher recall (more candidates). Probe cost
    per query is ~tables·|corpus|/2^planes instead of |corpus|."""
    buckets = lsh_buckets_udf(dims, planes, tables)

    def bucketed(df, id_alias, vec_alias):
        d = df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            F.posexplode(buckets(F.col(vec_col))).alias("tbl", "bkt"),
        )
        return d.select(id_alias, vec_alias, "tbl", "bkt")

    c = bucketed(corpus, "neighbor_id", "cv")
    q = bucketed(queries, "query_id", "qv")
    scored = (
        c.join(F.broadcast(q), on=["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank"))
    )
