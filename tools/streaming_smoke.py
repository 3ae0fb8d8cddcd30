"""Streaming-at-scale smoke (round 6, VERDICT r5 item 7): replay a
REPLICAS-x copy of the sf0.1 documents corpus through the streaming
operators and report throughput + state-store size.

Two legs:

1. ingest->match (`streaming_ingest_linkage`): the REPLICAS-x corpus is
   the static REFERENCE (its block keys persisted once); a 1x corpus
   arrives as a stream of parquet files in bounded micro-batches and is
   fuzzy-matched against it — the realistic streaming shape (small
   arrivals vs a large corpus; the matcher broadcasts the stream side).
   Reports stream docs/s and edges found.
2. watermark-evicting exact dedup (`streaming_exact_dedup`): the same
   corpus with synthetic event times spanning many watermark windows;
   reports rows/s and the MAX state rows across micro-batches vs the
   bound (distinct keys within a watermark window) — the evidence that
   state is bounded by the watermark, not by stream length.

Prints one JSON line; results recorded in BASELINE.md.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fuzzspark.pipeline import corpus_from_documents
from fuzzspark.session import get_spark
from fuzzspark.streaming.ops import streaming_exact_dedup, streaming_ingest_linkage

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("STREAM_SMOKE_REPLICAS", "50"))
SOURCE_FILES = int(os.environ.get("STREAM_SMOKE_FILES", "64"))


def build_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").alias("r"))
    big = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("r") * 1_000_000).alias("doc_id"),
        F.col("lang"), F.col("source"), F.col("n_chars"),
        F.concat(F.col("text"), F.lit(" r"),
                 F.col("r").cast("string")).alias("text"),
        F.col("r"))
    return big


def main() -> None:
    # the smoke persists the reference blocks + content ON TOP of 32
    # concurrent scorer buffers — borderline at the 8g default heap
    # (observed OOM on a noisy host); on a real cluster this memory is
    # per-executor, so size the single-JVM smoke accordingly
    os.environ.setdefault("FUZZSPARK_DRIVER_MEM", "16g")
    spark = get_spark("streaming-smoke", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"replicas": REPLICAS, "sf_dir": SF_DIR}

    wd = tempfile.mkdtemp(prefix="stream_smoke_")
    src = os.path.join(wd, "source")
    big = build_corpus(spark)
    files = corpus_from_documents(big.drop("r"))
    n_docs = files.count()
    out["reference_docs"] = n_docs

    # the stream: a 1x corpus (ids shifted clear of the reference) in
    # SOURCE_FILES files, processed a few files per micro-batch
    stream_files = corpus_from_documents(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumn("doc_id", F.col("doc_id") + 900_000_000))
    n_stream = stream_files.count()
    out["stream_docs"] = n_stream
    stream_files.repartition(SOURCE_FILES).write.parquet(src)

    # ---- leg 1: stream arrivals vs the big reference ----
    t0 = time.time()
    q = streaming_ingest_linkage(spark, src, files,
                                 workdir=os.path.join(wd, "link"),
                                 threshold=0.85,
                                 max_files_per_trigger=max(
                                     1, SOURCE_FILES // 16))
    q.awaitTermination()
    q.unpersist_reference()
    wall = time.time() - t0
    edges = spark.read.parquet(os.path.join(wd, "link", "edges"))
    out["match_wall_sec"] = round(wall, 1)
    out["match_stream_docs_per_sec"] = round(n_stream / wall, 1)
    out["match_edges"] = edges.count()
    out["match_batches"] = edges.select("batch_id").distinct().count()

    # ---- leg 2: watermark-evicting exact dedup over the 50x corpus --
    # synthetic event time: replica r arrives at minute 2*r -> the
    # 10-minute watermark window covers ~6 replicas of keys at once;
    # state must track ~that, NOT all replicas
    withts = (files
              .withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                          + F.make_interval(mins=((F.col("id")
                                                   / 1_000_000)
                                                  .cast("int") * 2))))
    # write the time-stamped corpus ORDERED by replica so micro-batches
    # advance event time (files are picked up in write order); the
    # readStream is defined AFTER the writes — file sources validate
    # the path eagerly
    for r0 in range(0, REPLICAS, max(1, REPLICAS // 16)):
        (withts.where((F.col("id") / 1_000_000).cast("int")
                      .between(r0, r0 + max(1, REPLICAS // 16) - 1))
         .coalesce(4).write.mode("append")
         .parquet(os.path.join(wd, "dedup_src")))
    stream = (spark.readStream.schema(withts.schema)
              .option("maxFilesPerTrigger", max(1, SOURCE_FILES // 16))
              .parquet(os.path.join(wd, "dedup_src")))
    t0 = time.time()
    dd = streaming_exact_dedup(stream, watermark="10 minutes")
    q2 = (dd.writeStream.outputMode("append")
          .format("parquet")
          .option("path", os.path.join(wd, "dedup_out"))
          .option("checkpointLocation", os.path.join(wd, "dedup_ck"))
          .trigger(availableNow=True).start())
    q2.awaitTermination()
    wall2 = time.time() - t0
    max_state = 0
    for p in q2.recentProgress:
        for so in p.get("stateOperators", []):
            max_state = max(max_state, so.get("numRowsTotal", 0))
    kept = spark.read.parquet(os.path.join(wd, "dedup_out")).count()
    out["dedup_wall_sec"] = round(wall2, 1)
    out["dedup_rows_per_sec"] = round(n_docs / wall2, 1)
    out["dedup_rows_kept"] = kept
    out["dedup_max_state_rows"] = max_state
    # bound: every content is distinct per replica here (replica suffix),
    # so a 10-min window (~6 replicas at 2 min spacing + slack) bounds
    # live keys; report the per-replica key count for the reader
    out["distinct_keys_per_replica"] = n_docs // REPLICAS
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
