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
    """(left_id, right_id, len1, len2, exact_equal) distinct pairs.

    ``files`` must have (id, content) — or, cheaper, precomputed
    (id, content_len, content_sha256) as 01_files provides; ``blocks``
    (id, block_key).  The same pair found via several keys is deduped
    BEFORE scoring (aggregation on the pair key — cheaper than scoring
    twice).

    TEXT IS NOT MATERIALIZED into the pair rows (round 4): inlining
    both contents would multiply the checkpoint by the pair
    amplification factor (a 100 TB corpus with 10x amplification would
    write petabytes); the scoring stage joins content by id instead.
    ``exact_equal`` therefore compares the sha256 of the contents —
    identical decisions, 64 bytes per side instead of the documents.

    ``broadcast_threshold`` (rows; round 5): when set and the sides
    projection (id + len + sha) has at most that many rows, broadcast
    it so both attach joins become BroadcastHashJoins and the amplified
    pair-id set never shuffles.  None (default) leaves the choice to
    Catalyst/AQE statistics.
    """
    cols = set(files.columns)
    sides = files.select(
        "id",
        (F.col("content_len") if "content_len" in cols
         else F.length("content")).alias("content_len"),
        (F.col("content_sha256") if "content_sha256" in cols
         else F.sha2(F.col("content").cast("binary"), 256)).alias("_sha"))
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
                      F.col("content_len").alias("len1"),
                      F.col("_sha").alias("_sha1"))
    rf = sides.select(F.col("id").alias("right_id"),
                      F.col("content_len").alias("len2"),
                      F.col("_sha").alias("_sha2"))
    if broadcast_threshold is not None and broadcast_threshold > 0 \
            and sides.count() <= broadcast_threshold:
        # the sides projection is ~80 B/row (id + len + sha); when it
        # fits, broadcasting turns both attach joins into
        # BroadcastHashJoins — the (amplified) pair-id set never
        # shuffles.  The deciding count is one cheap job (parquet
        # inputs answer from footer statistics).
        lf, rf = F.broadcast(lf), F.broadcast(rf)
    pairs = (pair_ids.join(lf, "left_id").join(rf, "right_id")
             .withColumn("exact_equal", F.col("_sha1") == F.col("_sha2")))
    # Catalyst-native prune: pairs that cannot reach the cutoff by length
    pairs = pairs.where(
        F.col("exact_equal")
        | length_prefilter(F.col("len1"), F.col("len2"), scorer, cutoff))
    return pairs.select("left_id", "right_id", "len1", "len2", "exact_equal")
