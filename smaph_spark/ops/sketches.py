"""Sketch aggregates — the sublinear-memory path for statistics whose
exact computation stops fitting at 100 TB.

Exact per-group distinct counts and order statistics (q11, q23) need
state proportional to the number of distinct values per group; at
corpus scale the right tool is a mergeable sketch: HyperLogLog++ for
distinct counts (`approx_count_distinct`, fixed ~kilobytes of state
per group at any cardinality) and Spark's quantile summary for
percentiles (`approx_percentile`, KLL/GK-style bounded state). Both
are JVM-side typed aggregates with map-side partial merge — one
shuffle of sketch state, never of raw values.

No DuckDB oracle by design: sketch estimates are engine-specific
(different HLL seeds/registers), so the driver records a rows-only
check; the VALUE guarantees are pytest-asserted against the exact
twins with the estimators' published error bounds
(tests/test_sketches.py). Reference analogue: the frequency/commonness
statistics the reference precomputes exactly at its (small) entity
scale — e.g. EntityToAnchors.createDB aggregation
(src/main/java/it/unipi/di/acube/smaph/entityfilters/ — S6/A3 family)
— which a web-scale corpus must sketch instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smaph_spark.plans.star_queries import load, register


def sketch_event_stats(
    events: DataFrame,
    rsd: float = 0.02,
    percentile_accuracy: int = 10_000,
) -> DataFrame:
    """Per event_type: HLL++ distinct users (relative std dev `rsd`)
    and approx p50/p95 of `value` (rank error <= 1/accuracy), plus the
    exact row count (a plain long agg, always cheap)."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
        F.percentile_approx(
            "value", [0.5, 0.95], percentile_accuracy
        ).alias("value_pcts"),
        F.count("*").alias("n_events"),
    ).select(
        "event_type", "approx_users",
        F.round(F.col("value_pcts")[0], 4).alias("approx_p50"),
        F.round(F.col("value_pcts")[1], 4).alias("approx_p95"),
        "n_events",
    )


def exact_event_stats(events: DataFrame) -> DataFrame:
    """The exact twin sk01 is error-bounded against (tests only — at
    scale this is the plan the sketch replaces)."""
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"
        ).alias("exact_p50"),
        F.expr(
            "percentile_disc(0.95) WITHIN GROUP (ORDER BY value)"
        ).alias("exact_p95"),
    )


@register(
    "sk01_event_sketch_stats",
    None,  # sketch values are engine-specific — rows-only at the
    # driver; error bounds vs the exact twin are pytest-asserted
    survey_ref="HLL++ distinct + quantile-summary percentiles (beyond-"
               "reference training-data op; the sublinear-state path "
               "for q11/q23-class stats at corpus scale)",
)
def sk_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketch_event_stats(load(spark, sf_dir, "events"))
