"""Evaluation — pairwise and cluster metrics.

Reference analogue: SolutionComputer macro/micro P/R/F1 with TP/FP/FN
(learn/SolutionComputer.java:33-184, printed by
RunBenchmark.printMetricsResultSet:240-247). Here the unit is the
record pair (BASELINE.json: pairwise F1 ≥ 0.99 on labeled same-block
pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_prf(predicted: DataFrame, gold: DataFrame) -> dict:
    """predicted(left_id, right_id [, is_match]) vs
    gold(left_id, right_id, is_match). Pairs are canonical
    (left_id < right_id). Gold pairs missing from `predicted` count as
    negative predictions (blocking loss shows up as FN, mirroring the
    reference's upper-bound oracles that separate candidate loss from
    scorer loss — SmaphAnnotator.java:820-911)."""
    pred = predicted
    if "is_match" in pred.columns:
        pred = pred.filter(F.col("is_match"))
    pred = pred.select("left_id", "right_id").withColumn("pred", F.lit(True))
    joined = gold.join(pred, ["left_id", "right_id"], "full_outer").select(
        F.coalesce(F.col("is_match"), F.lit(False)).alias("gold"),
        F.coalesce(F.col("pred"), F.lit(False)).alias("pred"),
    )
    row = joined.agg(
        F.sum((F.col("pred") & F.col("gold")).cast("long")).alias("tp"),
        F.sum((F.col("pred") & ~F.col("gold")).cast("long")).alias("fp"),
        F.sum((~F.col("pred") & F.col("gold")).cast("long")).alias("fn"),
    ).collect()[0]
    tp, fp, fn = row["tp"] or 0, row["fp"] or 0, row["fn"] or 0
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": p, "recall": r, "f1": f1}


def clusters_pairwise_prf(clusters: DataFrame, gold_clusters: DataFrame) -> dict:
    """Pairwise P/R/F1 induced by two clusterings over the same records.
    Computed via same-cluster self-join counts (no materialized pair
    explosion for the agreement term: sum of C(n,2) per intersection
    cell — all aggregations)."""
    merged = clusters.alias("p").join(
        gold_clusters.alias("g"), "record_id"
    ).select(
        F.col("p.cluster_id").alias("pc"), F.col("g.cluster_id").alias("gc")
    )

    def pairs_sum(df: DataFrame, cols: list[str]) -> int:
        row = (
            df.groupBy(*cols)
            .agg(F.count("*").alias("n"))
            .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("s"))
            .collect()[0]
        )
        return int(row["s"] or 0)

    tp = pairs_sum(merged, ["pc", "gc"])
    pred_pairs = pairs_sum(merged, ["pc"])
    gold_pairs = pairs_sum(merged, ["gc"])
    p = tp / pred_pairs if pred_pairs else 1.0
    r = tp / gold_pairs if gold_pairs else 1.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {
        "tp_pairs": tp,
        "pred_pairs": pred_pairs,
        "gold_pairs": gold_pairs,
        "precision": p,
        "recall": r,
        "f1": f1,
    }
