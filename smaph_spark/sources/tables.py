"""Input-table loader: Iceberg when available, parquet otherwise.

The north_rule reads the files corpus from an Iceberg table
(``files(repo, path, commit, lang, content)``). This sandbox ships no
Iceberg runtime jar, so the loader probes for the catalog support at
call time and falls back to a parquet directory with identical schema
— the pipeline itself is format-agnostic (it only sees a DataFrame).

At cluster scale the Iceberg path buys: snapshot-isolated reads (the
resumability contract pins a snapshot-id per run), partition pruning
on (lang, repo-bucket) partition specs, and metadata-only planning for
the per-partition lineage metrics. The parquet fallback preserves the
logical behavior minus time travel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg SparkCatalog is loadable in this session."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def load_files_table(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Load the files corpus from ``source``.

    * ``iceberg:<catalog.db.table>`` — Iceberg table scan; honors
      ``snapshot_id`` for time travel (the snapshot pinned in a run's
      stage metrics makes re-runs read the same data — north_rule
      resumability at the source, not just the stage cache).
    * anything else — parquet path fallback.
    """
    if source.startswith("iceberg:"):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg catalog requested but no Iceberg runtime jar is "
                "on the classpath (add org.apache.iceberg:iceberg-spark-"
                "runtime to spark.jars.packages); or pass a parquet path"
            )
        table = source.removeprefix("iceberg:")
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(table)
    return spark.read.parquet(source)
