"""Stage 5 — transitive clustering: hash-min connected components.

Reference analogue: the linkback stage assembles a consistent solution
from accepted candidates (GreedyLinkback.java:49-87 iterates argmax +
overlap removal). In the ER recast this is transitive closure of
accepted match pairs: iterative hash-min label propagation via
DataFrame self-joins (SURVEY §4 item 2), with ``localCheckpoint`` every
``cc_checkpoint_every`` iterations to truncate lineage, convergence
detected when no label changes. Cluster id = min record_id of the
component (deterministic).

Scale notes: each iteration is one shuffle on record_id; iteration
count ~ component diameter (dup clusters are shallow — the minhash
graph is near-clique, so 3-5 iterations in practice). AQE handles
skewed high-degree nodes; the blocking cap bounds max degree upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smaph_spark.config import ERConfig


def connected_components(
    matches: DataFrame, cfg: ERConfig, all_records: DataFrame | None = None
) -> tuple[DataFrame, list[dict]]:
    """matches(left_id, right_id) -> clusters(record_id, cluster_id).

    If ``all_records`` (DataFrame with record_id) is given, unmatched
    records appear as singleton clusters (cluster_id = record_id).
    Returns (clusters, per-iteration metrics list).
    """
    edges = (
        matches.select(
            F.col("left_id").alias("src"), F.col("right_id").alias("dst")
        )
        .union(
            matches.select(
                F.col("right_id").alias("src"), F.col("left_id").alias("dst")
            )
        )
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("record_id"))
        .distinct()
        .withColumn("cluster_id", F.col("record_id"))
    )
    labels = labels.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)

    history: list[dict] = []
    for it in range(cfg.cc_max_iterations):
        # candidate label per node: min over neighbours' labels
        neigh = (
            edges.join(labels, edges.dst == labels.record_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("neigh_min"))
        )
        new_labels = (
            labels.join(neigh, labels.record_id == neigh.src, "left")
            .select(
                "record_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("neigh_min"), F.col("cluster_id"))
                ).alias("new_cluster_id"),
                F.col("cluster_id"),
            )
        )
        changed = new_labels.filter(
            F.col("new_cluster_id") != F.col("cluster_id")
        ).count()
        labels = new_labels.select(
            "record_id", F.col("new_cluster_id").alias("cluster_id")
        )
        if (it + 1) % cfg.cc_checkpoint_every == 0 or changed == 0:
            labels = labels.localCheckpoint(eager=True)
        history.append({"iteration": it, "label_changes": int(changed)})
        if changed == 0:
            break

    if all_records is not None:
        labels = (
            all_records.select("record_id")
            .join(labels, "record_id", "left")
            .withColumn(
                "cluster_id", F.coalesce(F.col("cluster_id"), F.col("record_id"))
            )
        )
    return labels, history
