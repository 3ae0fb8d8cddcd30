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
    q.unpersist_reference()
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
        q.unpersist_reference()

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


def test_streaming_windowed_agg_operator_update_mode(spark, tmp_path):
    """The exported streaming_windowed_agg operator in update mode:
    last-write-wins per (window, group) across micro-batch emits equals
    the batch aggregate (the property the streaming_windows driver
    query and its DuckDB oracle rely on)."""
    from fuzzspark.streaming import streaming_windowed_agg
    src = str(tmp_path / "ev")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    events.write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = streaming_windowed_agg(stream, watermark="36500 days")
    sink = str(tmp_path / "sink")

    def wb(bdf, bid):
        if not bdf.isEmpty():
            bdf.withColumn("_bid", F.lit(int(bid))) \
               .write.mode("append").parquet(sink)

    q = (agg.writeStream.foreachBatch(wb).outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300)
    from pyspark.sql import Window
    w = Window.partitionBy("window_start", "event_type").orderBy(
        F.desc("_bid"))
    got = {(r["window_start"], r["event_type"]): (r["n_events"],
                                                  r["sum_value"])
           for r in (spark.read.parquet(sink)
                     .withColumn("_rn", F.row_number().over(w))
                     .where("_rn = 1").collect())}
    want = {(r["w"]["start"], r["event_type"]): (r["n"], r["s"])
            for r in (events.groupBy(F.window("ts", "1 hour").alias("w"),
                                     "event_type")
                      .agg(F.count("*").alias("n"),
                           F.round(F.sum("value"), 4).alias("s"))
                      .collect())}
    assert got == want and len(got) > 0


def test_streaming_windowed_agg_drops_late_rows(spark, tmp_path):
    """Watermark semantics: a second checkpointed availableNow run sees
    the watermark persisted by the first run, so a row older than
    (max_seen_ts - delay) is DROPPED — the state-size/late-data knob at
    scale.  An on-time row in the same second run still lands."""
    import pandas as pd

    from fuzzspark.streaming import streaming_windowed_agg
    src = str(tmp_path / "ev")
    os.makedirs(src)
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    def run_once():
        stream = (spark.readStream
                  .schema("ts timestamp, event_type string, value double")
                  .parquet(src))
        agg = streaming_windowed_agg(stream, watermark="30 minutes")

        def wb(bdf, bid):
            if not bdf.isEmpty():
                bdf.withColumn("_bid", F.lit(int(bid))) \
                   .write.mode("append").parquet(sink)

        q = (agg.writeStream.foreachBatch(wb).outputMode("update")
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(300)

    def write_rows(name, rows):
        import glob
        import shutil
        pdf = pd.DataFrame(rows, columns=["ts", "event_type", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        staging = str(tmp_path / f"_stage_{name}")
        spark.createDataFrame(pdf).coalesce(1).select(
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type", "value").write.parquet(staging, mode="overwrite")
        # the file stream source lists files directly under src
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    # run 1: advance the watermark to 11:30 (max 12:00 - 30 min)
    write_rows("f1", [("2026-01-01 10:10:00", "a", 1.0),
                      ("2026-01-01 12:00:00", "a", 2.0)])
    run_once()
    # run 2: 10:20 is before the persisted watermark -> dropped;
    # 12:30 is on time -> lands
    write_rows("f2", [("2026-01-01 10:20:00", "a", 100.0),
                      ("2026-01-01 12:30:00", "a", 4.0)])
    run_once()

    from pyspark.sql import Window
    w = Window.partitionBy("window_start", "event_type").orderBy(
        F.desc("_bid"))
    got = {r["window_start"].strftime("%H:%M"): (r["n_events"],
                                                 r["sum_value"])
           for r in (spark.read.parquet(sink)
                     .withColumn("_rn", F.row_number().over(w))
                     .where("_rn = 1").collect())}
    # late 100.0 row DROPPED; on-time 12:30 row joined the 12:00 window
    assert got == {"10:00": (1, 1.0), "12:00": (2, 6.0)}, got
