"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full ER pipeline (normalize → MinHash-LSH
                 blocking → pair scoring → connected components) over
                 the sf0.001 documents table.
queries()      — named queries, one per operator class of SURVEY.md §2
                 plus the training-data-pipeline ops (dedup, ANN,
                 text analysis, multimodal plumbing).
oracle_sql()   — DuckDB twins for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

# importing the ops modules populates the shared registry
from smaph_spark.plans import star_queries  # noqa: E402
from smaph_spark.ops import (  # noqa: F401,E402
    dedup, er_docs, multimodal, sampling, similarity, sketches, text,
)
from smaph_spark.plans.star_queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return er_docs.er_document_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins (omitted for non-SQL-expressible
    ops: MinHash/SimHash/hyperplane-LSH, winnowing fingerprints, the
    stubbed multimodal decoder, and the full ER pipeline — the driver
    records rows-only checks for those)."""
    return {
        name: spec.sql for name, spec in QUERIES.items() if spec.sql is not None
    }
