"""Streaming operator implementations."""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, functions as F

from fuzzspark.functions import length_prefilter, scorer_column, sha256_column
from fuzzspark.pipeline.blocking import block_keys

__all__ = ["streaming_exact_dedup", "streaming_fuzzy_match",
           "streaming_ingest_linkage"]


def streaming_exact_dedup(stream: DataFrame, *, content_col: str = "content",
                          ts_col: str = "ts",
                          watermark: str = "10 minutes") -> DataFrame:
    """Drop rows whose content hash was already seen within the
    watermark window (exact streaming dedup; state is bounded by the
    watermark — at 100 TB/day the watermark is the state-size knob)."""
    return (stream
            .withColumn("content_sha256", sha256_column(content_col))
            .withWatermark(ts_col, watermark)
            .dropDuplicates(["content_sha256"]))


def _match_batch(reference: DataFrame, scorer: str, threshold: float,
                 blocking_kwargs: dict):
    """Build the per-micro-batch matcher: batch_df (id, content, ...) ->
    match edges (stream_id, ref_id, score)."""
    ref_blocks = block_keys(reference, **blocking_kwargs) \
        .withColumnRenamed("id", "ref_id")
    ref_content = reference.select(F.col("id").alias("ref_id"),
                                   F.col("content").alias("ref_content"),
                                   F.length("content").alias("ref_len"))

    def run(batch_df: DataFrame) -> DataFrame:
        new_blocks = block_keys(batch_df, **blocking_kwargs) \
            .withColumnRenamed("id", "stream_id")
        new_content = batch_df.select(
            F.col("id").alias("stream_id"),
            F.col("content").alias("new_content"),
            F.length("content").alias("new_len"))
        # micro-batches are small vs the corpus: broadcast the stream side
        cand = (ref_blocks.join(F.broadcast(new_blocks), "block_key")
                .select("stream_id", "ref_id")
                .dropDuplicates(["stream_id", "ref_id"]))
        pairs = (cand.join(F.broadcast(new_content), "stream_id")
                 .join(ref_content, "ref_id")
                 .where(length_prefilter(F.col("new_len"), F.col("ref_len"),
                                         scorer, threshold)))
        scored = pairs.withColumn(
            "score", scorer_column(scorer, "new_content", "ref_content",
                                   "normalized_similarity",
                                   score_cutoff=threshold))
        return scored.where(F.col("score").isNotNull()) \
                     .select("stream_id", "ref_id",
                             F.round("score", 6).alias("score"))

    return run


def streaming_fuzzy_match(stream: DataFrame, reference: DataFrame, *,
                          scorer: str = "ratio", threshold: float = 0.9,
                          sink_dir: str, checkpoint_dir: str,
                          blocking_kwargs: Optional[dict] = None,
                          trigger_once: bool = True):
    """Fuzzy-match a stream of (id, repo, path, commit, lang, content)
    records against a static reference corpus; append match edges to a
    parquet sink.  Returns the StreamingQuery."""
    blocking_kwargs = blocking_kwargs or dict(use_exact=True, use_path=True,
                                              use_minhash=True)
    matcher = _match_batch(reference, scorer, threshold, blocking_kwargs)

    def for_each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        edges = matcher(batch_df)
        (edges.withColumn("batch_id", F.lit(batch_id))
              .write.mode("append").parquet(sink_dir))

    writer = (stream.writeStream
              .foreachBatch(for_each_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_ingest_linkage(spark, source_dir: str, reference: DataFrame, *,
                             workdir: str, scorer: str = "ratio",
                             threshold: float = 0.9,
                             schema=None):
    """End-to-end incremental linkage: watch ``source_dir`` for new
    corpus parquet files, fuzzy-match arrivals against ``reference``,
    append edges under ``workdir/edges`` (checkpoint
    ``workdir/_checkpoint``).  Batch connected-components folds the
    edge log in on the next full run — the standard
    stream-appends/batch-consolidates split."""
    stream = (spark.readStream.schema(schema or reference.schema)
              .parquet(source_dir))
    return streaming_fuzzy_match(
        stream, reference, scorer=scorer, threshold=threshold,
        sink_dir=os.path.join(workdir, "edges"),
        checkpoint_dir=os.path.join(workdir, "_checkpoint"))
