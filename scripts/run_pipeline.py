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
