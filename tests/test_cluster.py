"""Direct unit tests for large-star/small-star connected components
(non-vacuous: known graphs with known components)."""

import pytest


def _cc(spark, edges):
    from fuzzspark.pipeline import connected_components
    df = spark.createDataFrame(edges, "left_id: long, right_id: long")
    got = connected_components(df)
    return {r["id"]: r["cluster_id"] for r in got.collect()}


def test_chain(spark):
    # 1-2-3-4 chain + isolated pair
    labels = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_star_and_triangle(spark):
    labels = _cc(spark, [(5, 1), (5, 2), (5, 3), (7, 8), (8, 9), (7, 9)])
    assert labels == {1: 1, 2: 1, 3: 1, 5: 1, 7: 7, 8: 7, 9: 7}


def test_long_path_exceeds_one_round(spark):
    # path of 33 nodes: star-contraction needs several rounds
    edges = [(i, i + 1) for i in range(32)]
    labels = _cc(spark, edges)
    assert set(labels.values()) == {0}
    assert len(labels) == 33


def test_duplicate_and_reversed_edges(spark):
    labels = _cc(spark, [(2, 1), (1, 2), (2, 3), (3, 2), (2, 3)])
    assert labels == {1: 1, 2: 1, 3: 1}
