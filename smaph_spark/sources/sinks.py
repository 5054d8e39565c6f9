"""Export sinks beyond parquet/JSON.

NIF-style RDF turtle export of entity clusters — the analogue of the
reference's NIF dataset dump (SmaphUtils.exportToNif:781-801, which
serializes annotated documents through a TurtleNIFWriter). The ER
recast: each RECORD becomes a resource typed ``nif:Context`` whose
``itsrdf:taIdentRef`` points at its CLUSTER's canonical entity
resource — the cluster assignment as linked data.

Scale notes: every triple line is built with JVM expressions
(`format_string`) and written through the distributed text sink; each
statement uses absolute IRIs, so every part-file is a self-contained
valid Turtle document with no shared @prefix header (a driver-side
single-file concat would be the 100 TB anti-pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NIF_CONTEXT = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#Context"
ITSRDF_TA_IDENT_REF = "http://www.w3.org/2005/11/its/rdf#taIdentRef"


def clusters_to_nif_triples(
    clusters: DataFrame, base_uri: str = "http://example.org/smaph"
) -> DataFrame:
    """clusters(record_id, cluster_id) -> one turtle statement per row:

    ``<base/record/R> a <nif:Context> ; <itsrdf:taIdentRef>
    <base/entity/C> .``

    Absolute IRIs keep each line independently parseable. record_id may
    be negative (xxhash64): IRIs encode it in its decimal form, which
    is stable and reversible."""
    line = F.format_string(
        f"<{base_uri}/record/%s> a <{NIF_CONTEXT}> ; "
        f"<{ITSRDF_TA_IDENT_REF}> <{base_uri}/entity/%s> .",
        F.col("record_id").cast("string"),
        F.col("cluster_id").cast("string"),
    )
    return clusters.select(line.alias("value"))


def export_clusters_nif(
    clusters: DataFrame, path: str, base_uri: str = "http://example.org/smaph"
) -> None:
    """Write the cluster assignment as turtle part-files under ``path``
    (distributed text sink; deterministic content, order within a part
    follows the partition order)."""
    clusters_to_nif_triples(clusters, base_uri).write.mode(
        "overwrite"
    ).text(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> None:
    """Hive-partitioned parquet sink with bounded file sizes — the
    layout contract a 100 TB table needs for partition pruning AND
    sane file counts.

    - `repartition(partition_cols)` routes each output partition's rows
      to the minimum number of tasks (without it, every task holding a
      few rows of every partition writes num_tasks x num_partitions
      tiny files — the classic small-files failure).
    - `maxRecordsPerFile` re-splits oversized/hot partitions at write
      time, bounding the other tail (one giant file per hot key).
    - optional `sortWithinPartitions` clusters rows so parquet
      min/max column stats become selective (data skipping on read).
    """
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
