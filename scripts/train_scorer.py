#!/usr/bin/env python
"""Train + persist the pairwise GBT scorer artifact (models/gbt_scorer).

Trains on the seeded synthetic gold corpus, optionally runs the full
CrossValidator grid + feature-subset tune (M5, TuneModelLibSvm
analogue), sweeps the accept threshold, and saves model + threshold +
z-score table. The artifact is committed so driver runs load instead of
retraining; rerun this script to regenerate it.

Usage: python scripts/train_scorer.py [--tune] [--out models/gbt_scorer]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tune", action="store_true",
                    help="run the CV grid + feature-subset tune (slower)")
    ap.add_argument("--out", default=os.path.join(REPO, "models", "gbt_scorer"))
    ap.add_argument("--model-family", choices=("gbt", "linear"), default="gbt",
                    help="'linear' trains the LibLinearModel-analogue "
                         "logistic baseline instead of the GBT")
    ap.add_argument("--normalizer", choices=("zscore", "minmax"),
                    default="zscore",
                    help="sidecar stats family; for --model-family linear "
                         "also the in-pipeline scaler "
                         "(ScaleFeatureNormalizer analogue = minmax)")
    args = ap.parse_args()

    from smaph_spark.operators.model_io import save_scorer, train_default_scorer
    from smaph_spark.ops.er_docs import _DOC_CFG
    from smaph_spark.session import get_spark

    # train under the FLAGSHIP's config so training features match what
    # the committed artifact sees at inference (round-2 ADVICE: the
    # default-config artifact was applied to _DOC_CFG features), and
    # record the config in scorer_meta.json so loaders can verify
    spark = get_spark("train_scorer")
    model, threshold, stats, report = train_default_scorer(
        spark, cfg=_DOC_CFG, tune=args.tune,
        model_family=args.model_family, normalizer=args.normalizer,
    )
    save_scorer(model, args.out, threshold, stats, train_cfg=_DOC_CFG,
                normalizer_kind=args.normalizer)
    print(json.dumps({"out": args.out, "threshold": threshold,
                      "report": report}, indent=1, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
