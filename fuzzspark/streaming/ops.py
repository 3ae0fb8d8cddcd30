"""Streaming operator implementations."""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from fuzzspark.functions import length_prefilter, scorer_column, sha256_column
from fuzzspark.pipeline.blocking import block_keys

__all__ = ["streaming_exact_dedup", "streaming_fuzzy_match",
           "streaming_ingest_linkage", "streaming_stateful_dedup",
           "streaming_windowed_agg"]


def streaming_exact_dedup(stream: DataFrame, *, content_col: str = "content",
                          ts_col: str = "ts",
                          watermark: str = "10 minutes") -> DataFrame:
    """Drop rows whose content hash was already seen within the
    watermark window (exact streaming dedup; state is bounded by the
    watermark — at 100 TB/day the watermark is the state-size knob).

    ``dropDuplicatesWithinWatermark`` is the variant that actually
    EVICTS state as the watermark advances; plain ``dropDuplicates``
    on a non-event-time subset never evicts and grows without bound."""
    return (stream
            .withColumn("content_sha256", sha256_column(content_col))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_sha256"]))


def _match_batch(reference: DataFrame, scorer: str, threshold: float,
                 blocking_kwargs: dict, max_block: int | None = 200):
    """Build the per-micro-batch matcher: batch_df (id, content, ...) ->
    match edges (stream_id, ref_id, score)."""
    # the reference is static across micro-batches: persist its block
    # keys (the minhash UDF pass) and content projection once instead of
    # recomputing them every batch — at 100 TB the reference blocking is
    # the dominant per-batch cost without this
    ref_blocks = block_keys(reference, **blocking_kwargs) \
        .withColumnRenamed("id", "ref_id")
    if max_block:
        # skew defusal, streaming shape (round 6): a reference block
        # key shared by > max_block docs makes EVERY stream doc carrying
        # it a candidate against the whole block (the 50x smoke's
        # degenerate path key matched each arrival to 64k refs — 20M
        # candidate rows per 312-doc batch).  Hot keys carry no
        # discriminative signal; drop them ONCE at build time — true
        # near-dups still meet through their selective minhash band
        # keys (the batch pipeline's defuse_skew rationale, recall
        # floor measured in tools/skew_recall.py).  None disables.
        hot = (ref_blocks.groupBy("block_key").count()
               .where(F.col("count") > max_block).select("block_key"))
        ref_blocks = ref_blocks.join(F.broadcast(hot), "block_key",
                                     "left_anti")
    ref_blocks = ref_blocks.persist()
    # pre-partition the cached reference content on the join key (round
    # 6): every micro-batch's content-attach join then reuses this
    # partitioning and shuffles ONLY the batch-sized candidate side —
    # the old plan re-shuffled the ENTIRE reference every micro-batch
    # (at the 50x smoke that one exchange dominated the match leg)
    ref_content = (reference.select(F.col("id").alias("ref_id"),
                                    F.col("content").alias("ref_content"),
                                    F.length("content").alias("ref_len"))
                   .repartition("ref_id").persist())

    def run(batch_df: DataFrame) -> DataFrame:
        new_blocks = block_keys(batch_df, **blocking_kwargs) \
            .withColumnRenamed("id", "stream_id")
        new_content = batch_df.select(
            F.col("id").alias("stream_id"),
            F.col("content").alias("new_content"),
            F.length("content").alias("new_len"))
        # micro-batches are small vs the corpus: broadcast the stream
        # side (block keys + content are batch-sized BY CONTRACT; the
        # candidate set is NOT — a hot block key can fan out, so it is
        # never broadcast/collected).  The ref_content attach reuses
        # the cached reference partitioning on ref_id: only the
        # candidate side shuffles per batch
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

    def unpersist() -> None:
        """Release the cached reference projections (call once the
        stream is done — long-lived sessions building several matchers
        would otherwise accumulate executor storage)."""
        ref_blocks.unpersist()
        ref_content.unpersist()

    run.unpersist = unpersist
    return run


def streaming_fuzzy_match(stream: DataFrame, reference: DataFrame, *,
                          scorer: str = "ratio", threshold: float = 0.9,
                          sink_dir: str, checkpoint_dir: str,
                          blocking_kwargs: Optional[dict] = None,
                          trigger_once: bool = True,
                          max_block: int | None = 200):
    """Fuzzy-match a stream of (id, repo, path, commit, lang, content)
    records against a static reference corpus; append match edges to a
    parquet sink.  Returns the StreamingQuery.

    ``max_block`` drops reference block keys shared by more than that
    many reference docs (hot keys have no discriminative signal and
    amplify every arrival into whole-block candidates; None keeps
    all keys)."""
    blocking_kwargs = blocking_kwargs or dict(use_exact=True, use_path=True,
                                              use_minhash=True)
    matcher = _match_batch(reference, scorer, threshold, blocking_kwargs,
                           max_block=max_block)

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
    query = writer.start()
    # cleanup handle: the reference block keys / content projection stay
    # cached for the life of the stream; call this after termination
    query.unpersist_reference = matcher.unpersist
    return query


def streaming_ingest_linkage(spark, source_dir: str, reference: DataFrame, *,
                             workdir: str, scorer: str = "ratio",
                             threshold: float = 0.9,
                             schema=None,
                             max_files_per_trigger: int | None = None,
                             blocking_kwargs: Optional[dict] = None,
                             max_block: int | None = 200):
    """End-to-end incremental linkage: watch ``source_dir`` for new
    corpus parquet files, fuzzy-match arrivals against ``reference``,
    append edges under ``workdir/edges`` (checkpoint
    ``workdir/_checkpoint``).  Batch connected-components folds the
    edge log in on the next full run — the standard
    stream-appends/batch-consolidates split.

    ``max_files_per_trigger`` caps the files per micro-batch — set it
    so batches stay micro: the matcher broadcasts the STREAM side of
    each batch (the reference's block keys are persisted once), which
    is the right plan only while arrivals are small vs the corpus.

    ``blocking_kwargs`` / ``max_block`` forward to
    :func:`streaming_fuzzy_match` (round 7 — the end-to-end helper
    previously hard-coded the defaults, hiding the hot-key defusal
    knob from callers)."""
    reader = spark.readStream.schema(schema or reference.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               int(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    return streaming_fuzzy_match(
        stream, reference, scorer=scorer, threshold=threshold,
        sink_dir=os.path.join(workdir, "edges"),
        checkpoint_dir=os.path.join(workdir, "_checkpoint"),
        blocking_kwargs=blocking_kwargs, max_block=max_block)


def streaming_windowed_agg(stream: DataFrame, *, ts_col: str = "ts",
                           window: str = "1 hour",
                           watermark: str = "30 minutes",
                           group_cols=("event_type",),
                           value_col: str = "value") -> DataFrame:
    """Watermarked event-time tumbling-window aggregation — the
    streaming twin of the batch event_windows query: per (window x
    group) counts, distinct-user count is NOT streamable exactly
    (count distinct needs full state), so the streaming surface carries
    count + sum; the watermark bounds state (windows older than the
    watermark are finalized and evicted) and drops late rows.

    Write with ``update`` output mode: each micro-batch emits the
    CURRENT aggregate of every window it touched, so a last-write-wins
    read per (window, group) key equals the batch aggregate over all
    non-late rows — which makes the operator exactly checkable against
    the batch relation (q_streaming_windows)."""
    cols = [F.window(ts_col, window).alias("w"), *group_cols]
    return (stream.withWatermark(ts_col, watermark)
            .groupBy(*cols)
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(value_col), 4).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), *group_cols,
                    "n_events", "sum_value"))


def _stateful_dedup_step(key, pdf_iter, state, id_col: str,
                         timeout_minutes: int):
    """One keyed-state invocation (key = full content sha256).  Emits the
    first arrival for an unseen key; writes a CONSTANT-size marker (never
    the accumulated history); removes state on timeout instead of
    resurrecting it.  Module-level so tests can drive it with a fake
    GroupState."""
    import pandas as pd

    empty = pd.DataFrame({"id": pd.Series([], dtype="int64"),
                          "content_sha256": pd.Series([], dtype=object)})
    if state.hasTimedOut:
        # idle key: drop the marker entirely (do NOT update/re-arm —
        # that would resurrect the state and defeat eviction)
        state.remove()
        return empty
    first_id = None
    for pdf in pdf_iter:
        if first_id is None and len(pdf):
            first_id = int(pdf[id_col].iloc[0])
    if state.exists or first_id is None:
        out = empty
    else:
        out = pd.DataFrame({"id": [first_id], "content_sha256": [key[0]]})
    state.update((True,))  # constant-size marker, O(1) per key
    if timeout_minutes:
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
    return out


def streaming_stateful_dedup(stream: DataFrame, *, content_col: str = "content",
                             id_col: str = "id",
                             timeout_minutes: int = 0):
    """Cross-batch exact dedup with explicit keyed state
    (``applyInPandasWithState``): the first row for each content hash is
    emitted, later arrivals are dropped FOREVER (not just within a
    watermark window — the state outlives micro-batches).

    State key = the FULL sha256 of the content, state value = a
    constant one-byte seen-marker.  Per-batch state writes are O(keys
    in the batch) and each write is O(1) bytes — the state store (e.g.
    RocksDB on a real cluster) shards keys across executors, which is
    the design that survives 100 TB.  (A coarser key whose value
    accretes every hash ever seen would pay O(total history)
    serialization per batch — the anti-pattern this replaces.)

    ``timeout_minutes`` > 0 evicts idle keys via ProcessingTimeTimeout:
    a timed-out key's state is REMOVED (so the same content re-emits if
    it arrives again later) — the state-size/recall knob at scale.
    Returns a DataFrame to be written with ``update`` output mode.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (BooleanType, LongType, StringType,
                                   StructField, StructType)

    out_schema = StructType([
        StructField("id", LongType()),
        StructField("content_sha256", StringType()),
    ])
    state_schema = StructType([StructField("seen", BooleanType())])

    def dedup_fn(key, pdf_iter, state: GroupState):
        yield _stateful_dedup_step(key, pdf_iter, state, id_col,
                                   timeout_minutes)

    keyed = stream.withColumn("content_sha256", sha256_column(content_col))
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if timeout_minutes
               else GroupStateTimeout.NoTimeout)
    return keyed.groupBy("content_sha256").applyInPandasWithState(
        dedup_fn, outputStructType=out_schema,
        stateStructType=state_schema, outputMode="update",
        timeoutConf=timeout)
