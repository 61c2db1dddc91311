"""PageRank over edge-list DataFrames (operators/graph.py)."""

from __future__ import annotations

import pytest

from cdc_system_spark.operators.graph import pagerank


def test_pagerank_ranks_hub_highest(spark):
    # star: everyone points at node 1; node 1 points at node 2
    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 1), (5, 1), (1, 2)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=3).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1] == max(got.values())          # the hub wins
    assert got[2] > got[3]                      # fed by the hub > leaf
    assert got[3] == got[4] == got[5]           # symmetric leaves tie
    assert sum(got.values()) == pytest.approx(1.0, abs=0.3)  # mass ~conserved


def test_pagerank_is_layout_independent(spark):
    rows = [(i, (i * 7) % 23) for i in range(60) if i != (i * 7) % 23]
    edges = spark.createDataFrame(rows, "src long, dst long")
    a = {r["node"]: r["rank"] for r in pagerank(edges, iters=2).collect()}
    b = {
        r["node"]: r["rank"]
        for r in pagerank(edges.repartition(7), iters=2).collect()
    }
    assert a == b


def test_pagerank_validates_params(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(edges, iters=0)
    with pytest.raises(ValueError):
        pagerank(edges, damping=1.0)


def test_personalized_pagerank_concentrates_on_seed_neighborhood(spark):
    # two disjoint 3-cycles; seeding in one leaves the other at zero
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)],
        "src long, dst long",
    )
    got = {r["node"]: r["rank"]
           for r in pagerank(edges, iters=3, seeds=[1]).collect()}
    assert got[10] == got[11] == got[12] == 0.0   # unreachable from seed
    assert got[1] > 0 and got[2] > 0 and got[3] > 0
    assert got[1] == max(got.values())            # restart mass at the seed
    with pytest.raises(ValueError):
        pagerank(edges, seeds=[])


def test_label_propagation_finds_communities(spark):
    from cdc_system_spark.operators.graph import label_propagation

    # two triangles bridged by one weak edge: LPA separates them where
    # connected components would merge everything
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        "src long, dst long",
    )
    got = {r["node"]: r["community"] for r in label_propagation(edges, iters=3).collect()}
    assert got[1] == got[2] == got[3] == 1      # min label of the triangle
    assert got[10] == got[11] == got[12]
    assert got[10] != got[1]                     # the bridge does not merge
    # deterministic across layouts
    again = {
        r["node"]: r["community"]
        for r in label_propagation(edges.repartition(5), iters=3).collect()
    }
    assert again == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="iters"):
        label_propagation(edges, iters=0)


def test_label_propagation_isolated_pair_and_chain(spark):
    from cdc_system_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(5, 6), (20, 21), (21, 22)], "src long, dst long"
    )
    got = {r["node"]: r["community"] for r in label_propagation(edges, iters=4).collect()}
    assert got[5] == got[6] == 5
    assert got[20] == got[21] == got[22] == 20


def test_community_profile_cohesion(spark):
    from cdc_system_spark.operators.graph import (
        community_profile,
        label_propagation,
    )

    # two triangles bridged by one edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
        "src long, dst long",
    )
    labels = label_propagation(edges, iters=3)
    got = {r["community"]: r for r in community_profile(labels, edges).collect()}
    assert len(got) == 2
    for c, r in got.items():
        assert r["n_nodes"] == 3
        assert r["n_internal"] == 3          # the triangle
        assert r["n_external"] == 1          # the shared bridge
        assert r["cohesion"] == 0.75
    # isolated clique: cohesion exactly 1
    clique = spark.createDataFrame([(7, 8), (8, 9), (7, 9)], "src long, dst long")
    lab2 = label_propagation(clique, iters=2)
    prof = community_profile(lab2, clique).head()
    assert prof["cohesion"] == 1.0 and prof["n_external"] == 0
