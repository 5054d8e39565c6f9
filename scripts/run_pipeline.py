#!/usr/bin/env python
"""spark-submit entry point for the ER pipeline (north_rule: run via
``spark-submit --py-files`` on a multi-executor cluster).

Usage:
  spark-submit --py-files smaph_spark.zip scripts/run_pipeline.py \
      --input <files parquet> --output <clusters parquet> \
      [--checkpoint-dir DIR] [--threshold 0.6] [--no-broadcast-payload] \
      [--scorer models/gbt_scorer]   # persisted trained scorer (S8)

Package with:  python scripts/package.py   (→ dist/smaph_spark.zip)
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--no-broadcast-payload", action="store_true")
    ap.add_argument("--scorer", default=None,
                    help="path of a persisted scorer dir (save_scorer); "
                         "its swept threshold is used unless --threshold")
    ap.add_argument("--nif-output", default=None,
                    help="also export clusters as NIF-style RDF turtle "
                         "(SmaphUtils.exportToNif analogue)")
    ap.add_argument("--partition-buckets", type=int, default=None,
                    help="write --output as Hive-partitioned parquet on "
                         "pmod(cluster_id, N) buckets (bounded file "
                         "sizes via write_partitioned_parquet) instead "
                         "of a flat parquet dir")
    ap.add_argument("--max-records-per-file", type=int, default=1_000_000,
                    help="file-size bound for the partitioned sink")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from smaph_spark.config import ERConfig
    from smaph_spark.pipeline import ERPipeline

    spark = SparkSession.builder.appName("smaph_spark_er").getOrCreate()
    scorer_model = None
    kwargs = {}
    if args.scorer:
        from smaph_spark.operators.model_io import load_scorer

        scorer_model, swept_threshold, _ = load_scorer(args.scorer)
        kwargs["match_threshold"] = swept_threshold
    if args.threshold is not None:
        kwargs["match_threshold"] = args.threshold
    if args.no_broadcast_payload:
        kwargs["broadcast_payload"] = False
    cfg = ERConfig(**kwargs)

    files = spark.read.parquet(args.input)
    pipe = ERPipeline(spark, cfg, checkpoint_dir=args.checkpoint_dir,
                      scorer_model=scorer_model)
    res = pipe.run(files)
    if args.partition_buckets:
        from pyspark.sql import functions as F

        from smaph_spark.sources.sinks import write_partitioned_parquet

        # cluster ids are xxhash64-derived (uniform), so pmod buckets
        # give even partition sizes; sorting within partitions by
        # cluster_id makes parquet min/max stats selective for
        # point-lookups of a cluster
        out = res.clusters.withColumn(
            "cluster_bucket",
            F.pmod(F.col("cluster_id"), F.lit(args.partition_buckets)),
        )
        write_partitioned_parquet(
            out, args.output, ["cluster_bucket"],
            max_records_per_file=args.max_records_per_file,
            sort_cols=["cluster_id"],
        )
    else:
        res.clusters.write.mode("overwrite").parquet(args.output)
    if args.nif_output:
        from smaph_spark.sources.sinks import export_clusters_nif

        export_clusters_nif(res.clusters, args.nif_output)
    violations = ERPipeline.verify_content_sha(files, res.normalized)
    print(json.dumps({
        "clusters_written": args.output,
        "sha_violations": violations,
        "stage_metrics": {k: v for k, v in res.stage_metrics.items()
                          if k != "s5_cc_iterations"},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
