"""Transitive clustering: connected components on match edges.

Implements the alternating large-star / small-star algorithm (Kiveris
et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
public literature; the reference has no clustering at all, this stage
comes from BASELINE.json:north_rule).  Each round is two
``groupBy(node).agg(min(...))`` + join shuffles; converges in
O(log n) rounds with deterministic min-id labels so reruns reproduce
byte-identical cluster ids.  ``localCheckpoint`` truncates lineage so
the iterative plan doesn't snowball.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components"]


def _symmetrize(edges: DataFrame) -> DataFrame:
    if "left_id" in edges.columns:
        e = edges.select(F.col("left_id").alias("u"),
                         F.col("right_id").alias("v"))
    else:
        e = edges.select("u", "v")
    return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    mins = (e.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .withColumn("mn", F.least("mn", "u")))
    return (e.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Connect all smaller-or-equal neighbors of u to the minimum."""
    ee = e.where(F.col("v") <= F.col("u"))
    mins = (ee.groupBy("u").agg(F.min("v").alias("mn")))
    out = (ee.join(mins, "u")
           .select(F.col("v").alias("u"), F.col("mn").alias("v"))
           .where(F.col("u") != F.col("v")))
    anchor = mins.select(F.col("u"), F.col("mn").alias("v"))
    return out.unionByName(anchor).distinct()


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """edges(left_id, right_id) -> (id, cluster_id) with cluster_id =
    min member id.  Nodes absent from ``edges`` are not returned
    (callers union isolated nodes as their own cluster)."""
    def _fingerprint(df: DataFrame) -> tuple:
        """(edge count, order-insensitive 64-bit content hash) — one
        light aggregation instead of two exceptAll joins per round."""
        row = (df.agg(F.count("*").alias("n"),
                      F.expr("bit_xor(xxhash64(u, v))").alias("h"))
               .collect()[0])
        return (row["n"], row["h"])

    e = _symmetrize(edges).distinct().localCheckpoint()
    prev_fp = None
    for _ in range(max_iter):
        # both stars operate on the symmetrized neighborhood view; the
        # output of small-star is directed, so re-symmetrize each round.
        # duplicates don't change the min-aggregations, so no distinct
        # before large-star; the lazy checkpoint is materialized by the
        # fingerprint aggregation (one job per round).
        e2 = _small_star(
            _symmetrize(_large_star(_symmetrize(e)))
        ).localCheckpoint(eager=False)
        fp = _fingerprint(e2)
        e = e2
        if fp == prev_fp:
            break
        prev_fp = fp
    labels = (_symmetrize(e).groupBy("u")
              .agg(F.min("v").alias("mn"))
              .select(F.col("u").alias("id"),
                      F.least("u", "mn").alias("cluster_id")))
    return labels
