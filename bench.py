"""Headline benchmark — driver contract: ONE JSON line on stdout.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {...per-query sec...}, "sf": ..., "pairs_per_sec": ...}.

Scaling evidence (N vs 4N cores) is produced by tools/scaling_bench.py
and recorded in BASELINE.md / BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as em
    from fuzzspark.session import get_spark
    from fuzzspark.pipeline import (LinkageConfig, corpus_from_documents,
                                    run_pipeline)

    spark = get_spark("fuzzspark-bench", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # single-box local mode: python-worker throughput saturates below
    # the vCPU count (BENCH_SCALING.md controls); cap UDF-stage width
    spark.conf.set("fuzzspark.python.parallelism", str(min(CPUS, 16)))

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        timings[name] = round(time.time() - t0, 3)
        return n

    # warm the JVM + one python worker per core (excluded from timings)
    from pyspark.sql import functions as F
    from fuzzspark.functions import scorer_column
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    warm = spark.range(0, CPUS * 4, 1, CPUS * 4).selectExpr(
        "repeat('w', 64) as s1", "repeat('x', 64) as s2")
    warm.withColumn("r", scorer_column("ratio", "s1", "s2")) \
        .agg(F.sum("r")).collect()

    # 1. flagship scorer throughput: ratio over blocked document pairs.
    # pairs_per_sec keeps the round-1 methodology (first/cold run);
    # the warm re-run reports steady-state throughput with the scan
    # cache + python workers hot (host noise on this VM is documented
    # at +/-40% — BENCH_SCALING.md)
    def _ratio():
        df = em.q_ratio_docs(spark, SF_DIR)
        return df.count()

    n_pairs = timed("ratio_pairs", _ratio)
    extras["scored_pairs"] = n_pairs
    extras["pairs_per_sec"] = round(n_pairs / timings["ratio_pairs"], 1)
    t0 = time.time()
    _ratio()  # warm re-run: NOT in the headline total (extras only)
    extras["ratio_pairs_warm_sec"] = round(time.time() - t0, 3)
    extras["pairs_per_sec_warm"] = round(
        n_pairs / extras["ratio_pairs_warm_sec"], 1)

    # 2. short-string scorers over name pairs
    timed("levenshtein_pairs", lambda: em.q_levenshtein(spark, SF_DIR).count())
    timed("jaro_winkler_pairs",
          lambda: em.q_jaro_winkler(spark, SF_DIR).count())
    timed("damerau_pairs", lambda: em.q_damerau(spark, SF_DIR).count())

    # 3. end-to-end linkage pipeline (blocking -> scoring -> clustering)
    def _pipeline():
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        files = corpus_from_documents(docs)
        wd = tempfile.mkdtemp(prefix="fuzzspark_bench_")
        out = run_pipeline(spark, files, wd, LinkageConfig(threshold=0.85))
        return out["clusters"].count()

    timed("linkage_pipeline", _pipeline)
    t0 = time.time()
    _pipeline()  # noise probe: NOT in the headline total (extras only);
    # this VM's documented host-noise band is wide (BENCH_SCALING.md)
    extras["linkage_pipeline_rerun_sec"] = round(time.time() - t0, 3)

    # 4. training-data extras
    timed("minhash_candidates",
          lambda: em.q_minhash_candidates(spark, SF_DIR).count())
    timed("ann_cosine_topk", lambda: em.q_ann_cosine_topk(spark, SF_DIR).count())
    timed("ngram_jaccard", lambda: em.q_ngram_jaccard(spark, SF_DIR).count())
    timed("dedup_exact", lambda: em.q_dedup_exact(spark, SF_DIR).count())
    timed("token_stats", lambda: em.q_token_stats(spark, SF_DIR).count())
    timed("fingerprint", lambda: em.q_fingerprint(spark, SF_DIR).count())

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "fuzzspark headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extras,
        "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
