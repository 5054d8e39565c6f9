"""Stage 5 — transitive clustering: hash-min connected components.

Reference analogue: the linkback stage assembles a consistent solution
from accepted candidates (GreedyLinkback.java:49-87 iterates argmax +
overlap removal). In the ER recast this is transitive closure of
accepted match pairs: iterative hash-min label propagation via
DataFrame self-joins (SURVEY §4 item 2), with ``localCheckpoint`` every
``cc_checkpoint_every`` iterations to truncate lineage, convergence
detected when no label changes. Cluster id = min record_id of the
component (deterministic).

Scale notes: each iteration is one shuffle on record_id for the
neighbour step plus one self-join for pointer jumping
(label[x] <- label[label[x]]), so iteration count is O(log component
diameter) — a million-node CHAIN converges in ~20 iterations, where
plain hash-min label propagation would need a million (dup clusters
are near-cliques needing 2-3 either way; the jump step is what makes
the chain-shaped graphs of er03's token-band buckets safe at any
corpus size). AQE handles skewed high-degree nodes; the blocking cap
bounds max degree upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smaph_spark.config import ERConfig


def history_pseudo_edges(history_clusters: DataFrame) -> DataFrame:
    """history_clusters(record_id, cluster_id) -> canonicalized
    (left_id, right_id) pseudo-edges that re-encode an already-resolved
    clustering for a later CC run. Each member links to its cluster's
    canonical id, so the transitive closure of the pseudo-edges equals
    the original components — THE incremental fold: union these with
    the delta-touching match edges and re-run CC, and a new record
    bridging two old clusters merges them exactly as a full-batch run
    would. Shared by ERPipeline.run_incremental and the er04 gate query
    (round-4 review: the fold must live once)."""
    return history_clusters.filter(
        F.col("record_id") != F.col("cluster_id")
    ).select(
        F.least("record_id", "cluster_id").alias("left_id"),
        F.greatest("record_id", "cluster_id").alias("right_id"),
    )


def connected_components(
    matches: DataFrame, cfg: ERConfig, all_records: DataFrame | None = None
) -> tuple[DataFrame, list[dict]]:
    """matches(left_id, right_id) -> clusters(record_id, cluster_id).

    If ``all_records`` (DataFrame with record_id) is given, unmatched
    records appear as singleton clusters (cluster_id = record_id).
    Returns (clusters, per-iteration metrics list).
    """
    n_edges = matches.count()
    if n_edges <= cfg.cc_local_threshold:
        # tiny match graph: the iterative machinery (eager checkpoints +
        # per-iteration join/agg jobs) costs ~10 fixed stages — union-find
        # over a driver-local edge list (bounded at cc_local_threshold
        # rows, a few MB) produces the identical min-id labeling
        return _local_connected_components(matches, all_records, n_edges)
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
    prev_cached = None
    changed = 0
    for it in range(cfg.cc_max_iterations):
        # candidate label per node: min over neighbours' labels
        neigh = (
            edges.join(labels, edges.dst == labels.record_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("neigh_min"))
        )
        stepped = (
            labels.join(neigh, labels.record_id == neigh.src, "left")
            .select(
                "record_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("neigh_min"), F.col("cluster_id"))
                ).alias("mid_cluster_id"),
                F.col("cluster_id"),
            )
        ).persist()
        # pointer jumping: label[x] <- label[label[x]]. Neighbour
        # propagation alone needs ~diameter iterations — a CHAIN graph
        # (er03's token-band buckets produce exactly that shape) would
        # outrun any fixed iteration cap as the corpus grows. Labels
        # are node ids, so one self-join per iteration halves the
        # remaining chain depth: convergence in O(log diameter).
        ptr = stepped.select(
            F.col("record_id").alias("pj_id"),
            F.col("mid_cluster_id").alias("pj_lab"),
        )
        new_labels = (
            stepped.join(ptr, stepped.mid_cluster_id == ptr.pj_id, "left")
            .select(
                "record_id",
                F.least(
                    F.col("mid_cluster_id"),
                    F.coalesce(F.col("pj_lab"), F.col("mid_cluster_id")),
                ).alias("new_cluster_id"),
                F.col("cluster_id"),
            )
        ).persist()
        # ONE action per iteration: the agg materializes the persisted
        # labels AND returns the convergence count (previously a
        # .count() job plus a separate checkpoint job recomputed the
        # same shuffle — the dominant per-iteration driver overhead)
        changed = int(
            new_labels.agg(
                F.sum(
                    (F.col("new_cluster_id") != F.col("cluster_id")).cast("long")
                ).alias("c")
            ).collect()[0]["c"]
            or 0
        )
        # the action above baked stepped into new_labels' persisted
        # partitions (both sides of the self-join read the same cache)
        stepped.unpersist()
        labels = new_labels.select(
            "record_id", F.col("new_cluster_id").alias("cluster_id")
        )
        final_checkpointed = False
        if (it + 1) % cfg.cc_checkpoint_every == 0 or changed == 0:
            # truncate lineage (plan growth, not recompute, is the cost
            # once each step reads from the persisted parent)
            labels = labels.localCheckpoint(eager=True)
            new_labels.unpersist()
            final_checkpointed = True
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = new_labels
        history.append({"iteration": it, "label_changes": int(changed)})
        if changed == 0:
            break
    # exhausting cc_max_iterations off the checkpoint cadence would
    # leave the final iteration's persisted frame cached forever
    # (round-2 ADVICE): detach labels from it, then drop it
    if prev_cached is not None:
        if not final_checkpointed:
            labels = labels.localCheckpoint(eager=True)
        prev_cached.unpersist()
    if changed != 0:
        # a transitive chain longer than cc_max_iterations hops would be
        # silently split — surface it (ADVICE round 1)
        import warnings

        warnings.warn(
            f"hash-min CC did not converge in {cfg.cc_max_iterations} "
            f"iterations ({changed} labels still changing); clusters may "
            "be split",
            RuntimeWarning,
            stacklevel=2,
        )
    history.append({"converged": changed == 0})

    if all_records is not None:
        labels = (
            all_records.select("record_id")
            .join(labels, "record_id", "left")
            .withColumn(
                "cluster_id", F.coalesce(F.col("cluster_id"), F.col("record_id"))
            )
        )
    return labels, history


def _local_connected_components(
    matches: DataFrame, all_records: DataFrame | None, n_edges: int
) -> tuple[DataFrame, list[dict]]:
    """Driver-side union-find for small match graphs (see
    cc_local_threshold). Produces the same (record_id, cluster_id =
    min record_id of component) labeling as the distributed hash-min
    path; singletons handled identically via all_records."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    rows = matches.select("left_id", "right_id").collect()
    for r in rows:
        a, b = r["left_id"], r["right_id"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict[int, int] = {}
    for node in parent:
        root = find(node)
        prev = comp_min.get(root)
        if prev is None or node < prev:
            comp_min[root] = node
    labels_rows = [(node, comp_min[find(node)]) for node in parent]
    spark = matches.sparkSession
    labels = spark.createDataFrame(
        labels_rows or [], "record_id long, cluster_id long"
    )
    if all_records is not None:
        labels = (
            all_records.select("record_id")
            .join(F.broadcast(labels), "record_id", "left")
            .withColumn(
                "cluster_id", F.coalesce(F.col("cluster_id"), F.col("record_id"))
            )
        )
    history = [{"local_union_find": True, "edges": int(n_edges)},
               {"converged": True}]
    return labels, history
