"""Relational graph operators: co-occurrence projection and triangle
counting.

Complements the iterative graph algorithms already in the engine
(connected components in :mod:`dedup`, PageRank in plans/queries) with
the two classic JOIN-shaped graph workloads:

- **Bipartite → similarity projection** (`cooccurrence_edges`): nodes
  become connected when their key sets overlap enough (Jaccard). The
  projection join on the shared key is the textbook quadratic hazard —
  one hub key with a million nodes contributes 10¹² pairs — so the
  operator takes a ``max_key_degree`` cap that drops hub keys before
  the pair join (the standard mining practice: a key shared by
  everyone carries no similarity signal anyway). With the cap, the
  exchange is bounded by Σ_k min(deg k, cap)² over keys.
- **Triangle counting** (`triangle_counts`): the canonical two-join
  enumeration over ID-oriented edges (a<b<c), per-node counts and
  local clustering coefficients. Each triangle is produced exactly
  once; output and intermediate wedge volume are properties of the
  graph, not the corpus — on skewed degree distributions, orient by
  degree instead of ID before enumerating (noted inline).

Everything is pure DataFrame algebra — no driver-side graph state —
and deterministic, so the DuckDB oracles replay both operators
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    df: DataFrame,
    key_col: str,
    node_col: str,
    min_jaccard: float = 0.4,
    max_key_degree: int | None = None,
) -> DataFrame:
    """(node_a, node_b, shared, jaccard) undirected similarity edges
    (node_a < node_b) between nodes whose distinct key sets have
    Jaccard ≥ ``min_jaccard``.

    Jaccard rather than a raw shared-count threshold: an absolute
    count does not survive a corpus growing 100× (every pair's
    co-occurrence grows with activity), while set similarity is
    scale-stable. Node degrees are computed BEFORE the hub cap so the
    denominator reflects true set sizes; the cap only prunes which
    pairs can form."""
    from lion_parcel_etl_spark.operators.dedup import pin

    # pin: the deduped (key, node) table feeds BOTH self-join sides,
    # the node-degree aggregate and (with a cap) the key-degree
    # aggregate; unpinned, the distinct's exchange is not reused
    # across those consumers and the whole scan+regex+distinct chain
    # re-runs per consumer — measured 15.1 s → 5.0 s on the sf0.1
    # pair join alone
    # NULL keys can never equi-match, but counting them in the degree
    # would phantom-inflate the Jaccard denominator (a node with 3 real
    # keys + a NULL row would score 3/(4+3−3) on a perfect match
    # instead of 1.0) — drop them before the distinct
    kn = pin(
        df.select(F.col(key_col).alias("k"), F.col(node_col).alias("n"))
        .filter(F.col("k").isNotNull() & F.col("n").isNotNull())
        .distinct()
    )
    deg = kn.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    if max_key_degree is not None:
        kdeg = kn.groupBy("k").agg(F.count(F.lit(1)).alias("kd"))
        kn = kn.join(
            kdeg.filter(F.col("kd") <= max_key_degree).select("k"),
            "k",
            "left_semi",
        )
    a = kn.select(F.col("k"), F.col("n").alias("node_a"))
    b = kn.select(F.col("k"), F.col("n").alias("node_b"))
    shared = (
        a.join(b, "k")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    da = deg.select(F.col("n").alias("node_a"), F.col("d").alias("__da"))
    db = deg.select(F.col("n").alias("node_b"), F.col("d").alias("__db"))
    jac = F.col("shared").cast("double") / (
        F.col("__da") + F.col("__db") - F.col("shared")
    )
    return (
        shared.join(da, "node_a")
        .join(db, "node_b")
        .select(
            "node_a",
            "node_b",
            "shared",
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, degree, triangles, clustering_coeff) from an oriented
    edge table (node_a < node_b, unique pairs).

    Two equi-joins: wedges a→b→c then closure against (a, c); each
    triangle a<b<c is enumerated once. Per-node participation comes
    from exploding the triangle's three corners — output rows ∝
    3·#triangles. Local clustering coefficient =
    2·tri(v) / (deg(v)·(deg(v)−1)) over nodes with degree ≥ 2 (a
    near-dup clique scores 1.0). ID orientation keeps the oracle
    replay trivial; for power-law graphs orient by (degree, id) so
    high-degree vertices never anchor wedges. Callers iterating over
    the result should pin ``edges`` — it is scanned three times."""
    e = edges.select("node_a", "node_b")
    wedge = e.join(
        e.select(
            F.col("node_a").alias("node_b"), F.col("node_b").alias("node_c")
        ),
        "node_b",
    )
    # the closure join must match BOTH endpoints; express it as a
    # composite equi-join so it plans as a hash join, never a BNLJ
    tri = (
        wedge.alias("w")
        .join(
            e.select(
                F.col("node_a").alias("ca"), F.col("node_b").alias("cc")
            ).alias("c"),
            (F.col("w.node_a") == F.col("c.ca"))
            & (F.col("w.node_c") == F.col("c.cc")),
        )
        .select("node_a", "node_b", "node_c")
    )
    corners = (
        tri.select(F.col("node_a").alias("node"))
        .unionAll(tri.select(F.col("node_b").alias("node")))
        .unionAll(tri.select(F.col("node_c").alias("node")))
    )
    tn = corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    deg = (
        e.select(F.col("node_a").alias("node"))
        .unionAll(e.select(F.col("node_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tn, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.round(
                F.lit(2.0)
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
    )
