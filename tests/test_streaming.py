"""Structured Streaming operators: exact dedup + incremental fuzzy
match against a static corpus (availableNow micro-batch mode)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from fuzzspark.pipeline import corpus_to_spark, generate_corpus


def test_streaming_exact_dedup(spark, tmp_path):
    from fuzzspark.streaming import streaming_exact_dedup
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [(1, "same text", "2026-01-01 00:00:00"),
            (2, "same text", "2026-01-01 00:00:01"),
            (3, "other text", "2026-01-01 00:00:02")]
    df = spark.createDataFrame(rows, "id: long, content: string, ts_s: string") \
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df.write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(df.schema).parquet(src)
    deduped = streaming_exact_dedup(stream)
    q = (deduped.writeStream.format("memory").queryName("dedup_out")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_out").collect()
    assert len(out) == 2
    assert {r["content"] for r in out} == {"same text", "other text"}


def test_streaming_fuzzy_match(spark, tmp_path):
    from fuzzspark.streaming import streaming_fuzzy_match
    corpus = generate_corpus(n_clusters=40, seed=21, threshold=0.9)
    files, labeled, _ = corpus_to_spark(spark, corpus)
    # reference = first member of each cluster; stream = the rest
    reference = files.where(F.col("id").isin(
        [t[1] for t in corpus.clusters_truth if t[0] == t[1]]))
    arriving = files.join(reference.select("id"), "id", "left_anti")
    src = str(tmp_path / "incoming")
    arriving.write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(files.schema).parquet(src)
    sink = str(tmp_path / "edges")
    q = streaming_fuzzy_match(stream, reference, scorer="ratio",
                              threshold=0.9, sink_dir=sink,
                              checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(300)
    edges = spark.read.parquet(sink)
    n_edges = edges.count()
    assert n_edges > 0
    # every streamed match edge must be a true labeled match
    # (stream_id is the non-root member, ref_id the cluster root)
    lbl = (labeled.where("is_match")
           .select(F.col("right_id").alias("stream_id"),
                   F.col("left_id").alias("ref_id"))
           .join(reference.select(F.col("id").alias("ref_id")), "ref_id"))
    wrong = edges.join(lbl, ["stream_id", "ref_id"], "left_anti").count()
    assert wrong == 0, f"{wrong}/{n_edges} spurious match edges"
    # and recall over root<->member matches (member-member pairs are not
    # reachable when only roots are in the reference table)
    truth_root_pairs = lbl.count()
    assert n_edges >= 0.95 * truth_root_pairs


def test_streaming_restart_is_incremental(spark, tmp_path):
    """second availableNow run with same checkpoint processes nothing new."""
    from fuzzspark.streaming import streaming_fuzzy_match
    corpus = generate_corpus(n_clusters=10, seed=31, threshold=0.9)
    files, _, _ = corpus_to_spark(spark, corpus)
    reference = files.limit(10)
    src = str(tmp_path / "incoming")
    files.write.parquet(src, mode="overwrite")
    sink = str(tmp_path / "edges")
    ck = str(tmp_path / "ck")

    def run():
        stream = spark.readStream.schema(files.schema).parquet(src)
        q = streaming_fuzzy_match(stream, reference, scorer="ratio",
                                  threshold=0.95, sink_dir=sink,
                                  checkpoint_dir=ck)
        q.awaitTermination(300)

    run()
    n1 = spark.read.parquet(sink).count() if os.path.exists(sink) else 0
    run()  # same checkpoint: no new input -> no new edges
    n2 = spark.read.parquet(sink).count() if os.path.exists(sink) else 0
    assert n2 == n1


def test_streaming_stateful_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState: duplicates are dropped across micro-batches
    (state outlives the batch), and the state survives a checkpointed
    restart with new input files."""
    from fuzzspark.streaming import streaming_stateful_dedup
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    schema = "id: long, content: string"

    sink = str(tmp_path / "sink")

    def run_once():
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema).parquet(src)
        dedup = streaming_stateful_dedup(stream)

        def write_batch(batch_df, batch_id):
            if not batch_df.isEmpty():
                batch_df.write.mode("append").parquet(sink)

        q = (dedup.writeStream.foreachBatch(write_batch)
             .outputMode("update")
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    # within a batch, WHICH duplicate survives depends on arrival order
    # (any one representative is correct dedup semantics) — assert one
    # row per distinct content, not specific ids
    spark.createDataFrame([(1, "alpha"), (2, "beta"), (3, "alpha")], schema) \
        .write.mode("append").parquet(src)
    run_once()
    out1 = spark.read.parquet(sink).collect()
    assert len(out1) == 2
    assert len({r["content_sha256"] for r in out1}) == 2
    assert {r["id"] for r in out1} <= {1, 2, 3}

    # restart with a new file: 'alpha' and 'beta' must STILL be dups —
    # the keyed state was recovered from the checkpoint
    spark.createDataFrame([(4, "alpha"), (5, "gamma"), (6, "beta")], schema) \
        .write.mode("append").parquet(src)
    run_once()
    out2 = spark.read.parquet(sink).collect()
    assert len(out2) == 3
    new_rows = [r for r in out2 if r["id"] >= 4]
    assert [r["id"] for r in new_rows] == [5]  # only 'gamma' is new


def test_streaming_windowed_agg_matches_batch(spark, tmp_path):
    """the streaming twin of the (DuckDB-oracled) event_windows batch
    query: tumbling 1-hour windows over an event stream in complete
    mode equal the batch aggregation on the same data.  (countDistinct
    is unsupported in streaming aggs, so the twin covers count + sum.)"""
    src = str(tmp_path / "events")
    # watermarks need TIMESTAMP (testdata ships TIMESTAMP_NTZ)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    events.write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = (stream.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"))
           .select(F.col("w.start").alias("window_start"), "event_type",
                   "n_events", "sum_value"))
    q = (agg.writeStream.format("memory").queryName("win_out")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {(r["window_start"], r["event_type"]): (r["n_events"],
                                                  r["sum_value"])
           for r in spark.sql("SELECT * FROM win_out").collect()}
    want = {(r["window_start"], r["event_type"]): (r["n_events"],
                                                   r["sum_value"])
            for r in (events.groupBy(F.window("ts", "1 hour").alias("w"),
                                     "event_type")
                      .agg(F.count("*").alias("n_events"),
                           F.round(F.sum("value"), 4).alias("sum_value"))
                      .select(F.col("w.start").alias("window_start"),
                              "event_type", "n_events", "sum_value")
                      .collect())}
    assert got == want and len(got) > 0
