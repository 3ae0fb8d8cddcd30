"""Candidate-pair generation: within-block self-join + plan-level prunes.

The join is an equi hash join on ``block_key`` with ``left_id <
right_id`` dedup; the reference's kernel-internal prunes that are
expressible on plain columns (equality short-circuit, length-difference
cutoff — src/distance/levenshtein.rs:1126-1132) are emitted HERE as
Catalyst predicates so they run JVM-side below the Python scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fuzzspark.functions import length_prefilter

__all__ = ["candidate_pairs"]


def candidate_pairs(files: DataFrame, blocks: DataFrame, *,
                    scorer: str = "ratio", cutoff: float = 0.9,
                    broadcast_threshold: int | None = None) -> DataFrame:
    """(left_id, right_id, s1, s2, len1, len2, exact_equal) distinct pairs.

    ``files`` must have (id, content); ``blocks`` (id, block_key).
    The same pair found via several keys is deduped BEFORE scoring
    (aggregation on the pair key — cheaper than scoring twice).
    """
    sides = files.select("id", "content",
                         F.length("content").alias("content_len"))
    b = blocks
    left = b.alias("l")
    right = b.alias("r")
    pair_ids = (
        left.join(right, F.col("l.block_key") == F.col("r.block_key"))
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("left_id"), F.col("r.id").alias("right_id"))
        .dropDuplicates(["left_id", "right_id"])
    )
    lf = sides.select(F.col("id").alias("left_id"),
                      F.col("content").alias("s1"),
                      F.col("content_len").alias("len1"))
    rf = sides.select(F.col("id").alias("right_id"),
                      F.col("content").alias("s2"),
                      F.col("content_len").alias("len2"))
    pairs = (pair_ids.join(lf, "left_id").join(rf, "right_id")
             .withColumn("exact_equal", F.col("s1") == F.col("s2")))
    # Catalyst-native prune: pairs that cannot reach the cutoff by length
    pairs = pairs.where(
        F.col("exact_equal")
        | length_prefilter(F.col("len1"), F.col("len2"), scorer, cutoff))
    return pairs
