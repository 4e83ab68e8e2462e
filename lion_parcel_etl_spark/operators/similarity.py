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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Fixed random-hyperplane seeds for LSH (one 32-bit hash per plane per
# dimension via md5 of "plane:dim" — deterministic, engine-agnostic).
LSH_PLANES = 16


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


def _plane_hash(plane: int, dim: int) -> Column:
    # deterministic pseudo-random coefficient in [-0.5, 0.5)
    h = F.conv(F.substring(F.md5(F.lit(f"plane{plane}:d{dim}")), 1, 8), 16, 10).cast("bigint")
    return h.cast("double") / F.lit(4294967296.0) - F.lit(0.5)


def lsh_bucket(vec: Column, dims: int, planes: int = LSH_PLANES, table: int = 0) -> Column:
    """Random-hyperplane signature: bit p = sign(vec · r_p). ``table``
    offsets the plane seeds so each hash table is independent."""
    acc = None
    for p in range(planes):
        proj = None
        for d in range(dims):
            term = F.element_at(vec, d + 1).cast("double") * _plane_hash(table * 1000 + p, d)
            proj = term if proj is None else proj + term
        bit = F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        acc = bit if acc is None else acc + bit
    return acc


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

    def bucketed(df, id_alias, vec_alias):
        d = df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            lsh_bucket(F.col(vec_col), dims, planes, t).alias("bkt"),
                        )
                        for t in range(tables)
                    ]
                )
            ).alias("tb"),
        )
        return d.select(id_alias, vec_alias, "tb.tbl", "tb.bkt")

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
