"""Transitive clustering: connected components on match edges.

Implements the alternating large-star / small-star algorithm (Kiveris
et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
public literature; the reference has no clustering at all, this stage
comes from BASELINE.json:north_rule).  Each round is two
``groupBy(node).agg(min(...))`` + join shuffles; converges in
O(log n) rounds with deterministic min-id labels so reruns reproduce
byte-identical cluster ids.  Per-round checkpointing truncates lineage
so the iterative plan doesn't snowball; with a checkpoint dir
configured the rounds use RELIABLE checkpoints (fault-tolerant to
block eviction and executor loss — see connected_components).
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


def _driver_union_find(e: DataFrame) -> DataFrame:
    """Finish a small edge set driver-side: union-by-min with path
    compression (roots are automatically the component minimum — the
    smaller id is always kept as the root of any union).  The standard
    small-tail cutoff for iterative CC: the last rounds of star
    contraction operate on a tiny graph where per-round distributed job
    overhead dominates, at ANY input scale."""
    import pandas as pd

    pdf = e.toPandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    nodes = pd.unique(pd.concat([pdf["u"], pdf["v"]], ignore_index=True))
    labels = pd.DataFrame({
        "id": nodes.astype("int64"),
        "cluster_id": [find(int(n)) for n in nodes],
    })
    return e.sparkSession.createDataFrame(labels,
                                          "id: long, cluster_id: long")


def connected_components(edges: DataFrame, max_iter: int = 20,
                         driver_finish_edges: int = 1_000_000,
                         stats: dict | None = None,
                         checkpoint: str = "auto") -> DataFrame:
    """edges(left_id, right_id) -> (id, cluster_id) with cluster_id =
    min member id.  Nodes absent from ``edges`` are not returned
    (callers union isolated nodes as their own cluster).

    Distributed star rounds contract the graph; once the surviving edge
    set fits under ``driver_finish_edges`` (components are invariant
    under the star transforms) a driver-side union-find finishes it —
    set 0 to force the fully-distributed fixpoint.

    ``checkpoint``: ``'reliable'`` truncates per-round lineage with
    ``df.checkpoint()`` (files under the SparkContext checkpoint dir —
    fault-tolerant: a lost/evicted block is re-read from disk, which is
    what an iterative job needs both under single-JVM memory pressure
    and on a real cluster that loses executors; ``localCheckpoint``
    blocks are UNRECOVERABLE once lost because the lineage is already
    truncated).  ``'local'`` keeps localCheckpoint;
    ``'auto'`` (default) uses reliable iff a checkpoint dir is
    configured — run_pipeline sets one under the stage workdir.

    ``stats`` (optional dict) is filled with the per-round contracted
    (symmetrized, distinct) edge counts and where the driver finish cut
    in — the data an operator needs to size ``driver_finish_edges``
    (surfaced into the 05_clusters stage manifest by run_pipeline)."""
    def _fingerprint(df: DataFrame) -> tuple:
        """(edge count, order-insensitive 64-bit content hash) — one
        light aggregation instead of two exceptAll joins per round."""
        row = (df.agg(F.count("*").alias("n"),
                      F.expr("bit_xor(xxhash64(u, v))").alias("h"))
               .collect()[0])
        return (row["n"], row["h"])

    if stats is None:
        stats = {}
    sc = edges.sparkSession.sparkContext
    if checkpoint == "auto":
        try:
            has_dir = sc._jsc.sc().getCheckpointDir().isDefined()
        except Exception:  # pragma: no cover — py4j API drift
            has_dir = False
        checkpoint = "reliable" if has_dir else "local"

    keep_refs: list[DataFrame] = []  # pin rounds: a python-GC'd round

    # would let ContextCleaner unpersist blocks/shuffles a retried task
    # still needs
    def _ck(df: DataFrame, eager: bool = True) -> DataFrame:
        out = (df.checkpoint(eager=eager) if checkpoint == "reliable"
               else df.localCheckpoint(eager=eager))
        keep_refs.append(out)
        return out

    stats["round_edges"] = []
    stats["driver_finish_threshold"] = driver_finish_edges
    stats["driver_finish_at_edges"] = None
    stats["checkpoint_mode"] = checkpoint
    e = _ck(_symmetrize(edges).distinct())
    prev_fp = _fingerprint(e)
    stats["round_edges"].append(prev_fp[0])
    if driver_finish_edges and prev_fp[0] <= driver_finish_edges:
        stats["driver_finish_at_edges"] = prev_fp[0]
        return _driver_union_find(e)
    for _ in range(max_iter):
        # both stars operate on the symmetrized neighborhood view; the
        # output of small-star is directed, so re-symmetrize each round.
        # duplicates don't change the min-aggregations, so no distinct
        # before large-star; the lazy checkpoint is materialized by the
        # fingerprint aggregation (one job per round).
        e2 = _ck(_small_star(
            _symmetrize(_large_star(_symmetrize(e)))
        ), eager=False)
        fp = _fingerprint(e2)
        e = e2
        stats["round_edges"].append(fp[0])
        if driver_finish_edges and fp[0] <= driver_finish_edges:
            stats["driver_finish_at_edges"] = fp[0]
            return _driver_union_find(e)
        if fp == prev_fp:
            break
        prev_fp = fp
    labels = (_symmetrize(e).groupBy("u")
              .agg(F.min("v").alias("mn"))
              .select(F.col("u").alias("id"),
                      F.least("u", "mn").alias("cluster_id")))
    return labels
