"""Graph operator tests (operators/graph.py)."""

import pyspark.sql.functions as F
import pytest

from lion_parcel_etl_spark.operators.graph import (
    cooccurrence_edges,
    triangle_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "node_a long, node_b long"
    )


def test_triangle_counts_on_clique_plus_pendant(spark):
    # 4-clique {1,2,3,4} plus pendant 5-1
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    tri = {
        r["node"]: r
        for r in triangle_counts(_edges(spark, clique + [(1, 5)])).collect()
    }
    # every clique node sits on C(3,2)=3 triangles
    for n in (2, 3, 4):
        assert tri[n]["triangles"] == 3
        assert tri[n]["clustering_coeff"] == 1.0
    # node 1 has degree 4 (clique + pendant): 3 triangles over C(4,2)=6
    assert tri[1]["triangles"] == 3 and tri[1]["clustering_coeff"] == 0.5
    # pendant has degree 1 → excluded
    assert 5 not in tri


def test_triangle_counts_square_has_none(spark):
    square = [(1, 2), (2, 3), (3, 4), (1, 4)]
    rows = triangle_counts(_edges(spark, square)).collect()
    assert len(rows) == 4
    assert all(r["triangles"] == 0 and r["clustering_coeff"] == 0.0 for r in rows)


def test_degree_orientation_collapses_star_wedges(spark):
    """Skew case from SCALE.md: star + clique. The star hub (highest
    degree) gets out-degree 0 under (degree, id) orientation, so it
    anchors ZERO wedges — ID orientation (hub id below every leaf id)
    would anchor C(n_leaves + 4, 2) at the hub. The attached clique's
    triangles still come out exactly."""
    from lion_parcel_etl_spark.operators.graph import (
        _degree_oriented,
        _oriented_wedges,
    )

    n_leaves = 40
    hub = 0  # smallest id: adversarial for ID orientation
    star = [(hub, leaf) for leaf in range(100, 100 + n_leaves)]
    clique = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    edges = _edges(spark, star + clique + [(hub, 1)])

    e = edges.select("node_a", "node_b")
    deg = (
        e.select(F.col("node_a").alias("node"))
        .unionAll(e.select(F.col("node_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    oriented = _degree_oriented(e, deg)
    # the hub (degree 41, max) is never a wedge anchor
    out_deg = {
        r["src"]: r["n"]
        for r in oriented.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert hub not in out_deg
    wedges = _oriented_wedges(oriented).count()
    # ID orientation would anchor C(41, 2) = 820 wedges at the hub
    # alone; degree orientation's total is bounded by the clique
    id_oriented_hub_wedges = (n_leaves + 1) * n_leaves // 2
    assert wedges < 25 < id_oriented_hub_wedges
    # triangles still exact: K5 → C(4,2)=6 per clique node, cc=1.0;
    # the hub (degree ≥ 2 via leaves + clique node 1) sits on none
    tri = {r["node"]: r for r in triangle_counts(edges).collect()}
    for n in range(1, 6):
        assert tri[n]["triangles"] == 6
    assert tri[1]["clustering_coeff"] < 1.0  # hub edge dilutes node 1
    assert tri[hub]["triangles"] == 0


@pytest.fixture()
def bipartite(spark):
    # users 1,2 share keys {10,11,12} fully (J=1); user 3 shares one
    # key with each (J=1/4 with either); key 99 is a hub touching all
    rows = (
        [(k, 1) for k in (10, 11, 12)]
        + [(k, 2) for k in (10, 11, 12)]
        + [(10, 3), (13, 3)]
        + [(99, 1), (99, 2), (99, 3), (99, 4)]
    )
    return spark.createDataFrame(rows, "k long, u long")


def test_cooccurrence_jaccard_values(bipartite):
    got = {
        (r["node_a"], r["node_b"]): r["jaccard"]
        for r in cooccurrence_edges(bipartite, "k", "u", min_jaccard=0.0).collect()
    }
    # with the hub key included: |1|=|2|=4, shared(1,2)=4 → J=1
    assert got[(1, 2)] == 1.0
    # shared(1,3)={10,99}=2, |3|=3 → 2/(4+3-2)=0.4
    assert got[(1, 3)] == 0.4


def test_cooccurrence_hub_cap_prunes_hub_only_pairs(bipartite):
    got = cooccurrence_edges(
        bipartite, "k", "u", min_jaccard=0.0, max_key_degree=3
    ).collect()
    pairs = {(r["node_a"], r["node_b"]): (r["shared"], r["jaccard"]) for r in got}
    # hub key 99 (degree 4 > cap) dropped from pair formation:
    # shared(1,3) falls to {10} but degrees (denominator) still
    # count the hub key
    assert pairs[(1, 3)][0] == 1
    assert pairs[(1, 3)][1] == round(1 / (4 + 3 - 1), 6)
    # fully-overlapping pair survives on its non-hub keys
    assert pairs[(1, 2)][0] == 3
    # user 4 was ONLY reachable through the hub: no pair forms
    assert not any(4 in p for p in pairs)


def test_cooccurrence_threshold_filters(bipartite):
    got = cooccurrence_edges(bipartite, "k", "u", min_jaccard=0.9).collect()
    assert [(r["node_a"], r["node_b"]) for r in got] == [(1, 2)]


def test_kcore_rejects_nonpositive_rounds():
    import pytest

    from lion_parcel_etl_spark.operators.graph import kcore_survivors

    with pytest.raises(ValueError, match="rounds"):
        kcore_survivors(None, k=2, rounds=0)
