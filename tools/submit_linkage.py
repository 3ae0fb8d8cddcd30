"""spark-submit entry point for the linkage pipeline.

Cluster:
    python -c "from fuzzspark.session import package_zip; print(package_zip())"
    spark-submit --py-files /tmp/fuzzspark_pkg.zip tools/submit_linkage.py \
        --input  s3://bucket/corpus/            (iceberg: catalog.db.table) \
        --workdir s3://bucket/linkage_run_42/ \
        --threshold 0.9 --format parquet

Local smoke:
    python tools/submit_linkage.py --input /root/testdata/sf0.001 \
        --workdir /tmp/linkage_demo --from-documents

The script only uses the SparkSession given by spark-submit (or builds a
local one); all engine logic lives in the fuzzspark package.
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="corpus path (parquet dir) or iceberg table name")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--scorer", default="ratio")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg"])
    ap.add_argument("--from-documents", action="store_true",
                    help="input is a documents table; map to corpus shape")
    ap.add_argument("--eval-labels", default=None,
                    help="optional labeled-pairs parquet for F1 report")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from fuzzspark.session import _ship_package
    from fuzzspark.pipeline import (LinkageConfig, corpus_from_documents,
                                    evaluate_f1, run_pipeline)

    spark = SparkSession.builder.appName("fuzzspark-linkage").getOrCreate()
    _ship_package(spark)

    if args.format == "iceberg":
        files = spark.read.format("iceberg").load(args.input)
    else:
        path = args.input
        if os.path.isdir(path) and os.path.exists(
                os.path.join(path, "documents.parquet")):
            path = os.path.join(path, "documents.parquet")
        files = spark.read.parquet(path)
    if args.from_documents or "doc_id" in files.columns:
        files = corpus_from_documents(files)

    out = run_pipeline(spark, files, args.workdir,
                       LinkageConfig(scorer=args.scorer,
                                     threshold=args.threshold))
    report = {
        "clusters": out["clusters"].count(),
        "match_edges": out["scores"].where(
            f"score >= {args.threshold}").count(),
        "stages_run": out["runner"].stages_run,
        "stages_resumed": out["runner"].stages_skipped,
    }
    if args.eval_labels:
        labeled = spark.read.parquet(args.eval_labels)
        report["f1"] = evaluate_f1(out["scores"], labeled, args.threshold)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
