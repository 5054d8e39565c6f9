"""Structured-Streaming surface.

The reference is request/response + batch (no streaming operators —
SURVEY §2.9); the rebuilt engine exposes the standard streaming recast
of its windowed aggregations so the same logical query runs over a
stream: readStream → watermark → tumbling-window agg → sink. Used by
tests with a parquet source + memory sink (processAllAvailable drives
the batch to completion synchronously).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_hourly_event_counts(
    spark: SparkSession, events_dir: str, schema, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of q19_hourly_event_counts: tumbling 1-hour window
    counts per event_type with a watermark for late data."""
    events = spark.readStream.schema(schema).parquet(events_dir)
    # watermarks require TIMESTAMP (LTZ); the parquet column is NTZ —
    # session TZ is pinned UTC so the cast is a no-op on the wall clock
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drive the streaming query over all currently-available input and
    stop. ``append`` emits watermark-finalized rows only; ``complete``
    re-emits the full aggregation state each trigger — on a bounded
    input that makes a windowed agg equal its batch twin exactly (the
    driver-gate parity mode, st02)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def streaming_exact_dedup(
    spark: SparkSession, docs_dir: str, schema, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup (dd01's streaming twin): emit each distinct
    content hash once within the watermark horizon via
    dropDuplicatesWithinWatermark — the state-store-backed analogue of
    the batch hash-groupBy; state for a hash is dropped once the
    watermark passes it, bounding memory on an unbounded stream."""
    docs = spark.readStream.schema(schema).parquet(docs_dir)
    docs = docs.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        docs.withColumn("text_md5", F.md5(F.coalesce(F.col("text"), F.lit(""))))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text_md5"])
        .select("doc_id", "text_md5", "ts")
    )


_DURATION_UNITS_MS = {
    "us": 1, "microsecond": 1, "ms": 1, "millisecond": 1, "milli": 1,
    "second": 1_000, "sec": 1_000, "s": 1_000,
    "minute": 60_000, "min": 60_000, "m": 60_000,
    "hour": 3_600_000, "h": 3_600_000,
    "day": 86_400_000, "d": 86_400_000, "week": 604_800_000, "w": 604_800_000,
}
# Spark counts 'us'/'ms' sub-ms units; state timeouts are ms-grained,
# so microseconds floor to 1 ms rather than 0 (never a zero timeout)


def duration_ms(spec: str) -> int:
    """Parse a Spark CalendarInterval-style string to milliseconds:
    '1 hour', '30 SECONDS', '1 min', '1 hour 30 minutes' — every form
    ``withWatermark`` accepts must parse here too (this feeds the state
    timeout default), so: case-insensitive, plural/abbreviated units,
    multiple value-unit components summed."""
    parts = spec.strip().lower().split()
    if parts and parts[0] == "interval":  # optional leading keyword
        parts = parts[1:]
    if not parts or len(parts) % 2 != 0:
        raise ValueError(f"cannot parse interval: {spec!r}")
    total = 0
    for n, unit in zip(parts[::2], parts[1::2]):
        # exact unit first — plural-stripping 'ms'/'us' would corrupt
        # them into 'm'/'u' (minutes / unknown)
        if unit in _DURATION_UNITS_MS:
            u = unit
        elif unit.rstrip("s") in _DURATION_UNITS_MS:  # 'mins' -> 'min'
            u = unit.rstrip("s")
        else:
            raise ValueError(f"unknown interval unit {unit!r} in {spec!r}")
        total += int(n) * _DURATION_UNITS_MS[u]
    return total


def streaming_match_count_stateful(
    spark: SparkSession, pairs_dir: str, schema, threshold: float = 0.6,
    watermark: str = "1 hour", timeout: str | None = None,
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per block_key, maintain a running (n_pairs, n_matches) state over
    the scored-pair stream and emit an updated row per batch — the
    streaming form of the pipeline's per-block match metrics (A10).
    State times out ``timeout`` (default: the watermark duration) of
    event time past the watermark — derived from the arguments, not a
    fixed literal, so state-store size tracks the caller's horizon
    (round-2 ADVICE: a hardcoded +1h offset with watermark='1 minute'
    held state ~60x longer than documented)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    timeout_ms = duration_ms(timeout if timeout is not None else watermark)
    pairs = spark.readStream.schema(schema).parquet(pairs_dir)
    pairs = pairs.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (block_key,) = key
            n_pairs, n_matches = state.get
            state.remove()
            yield pd.DataFrame(
                {"block_key": [block_key], "n_pairs": [n_pairs],
                 "n_matches": [n_matches], "final": [True]}
            )
            return
        n_pairs, n_matches = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_pairs += len(pdf)
            n_matches += int((pdf["score"] >= threshold).sum())
        state.update((n_pairs, n_matches))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + timeout_ms)
        (block_key,) = key
        yield pd.DataFrame(
            {"block_key": [block_key], "n_pairs": [n_pairs],
             "n_matches": [n_matches], "final": [False]}
        )

    return pairs.groupBy("block_key").applyInPandasWithState(
        update,
        outputStructType="block_key string, n_pairs long, n_matches long, "
                         "final boolean",
        stateStructType="n_pairs long, n_matches long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_interval_join(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    left_schema,
    right_schema,
    on: str,
    left_time: str,
    right_time: str,
    low_offset_s: int = -3600,
    high_offset_s: int = 0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of operators/rangejoin.interval_join: stream-
    stream INNER join on ``on`` plus the event-time range
    ``l[left_time] + low <= r[right_time] <= l[left_time] + high``.

    This is the canonical Structured Streaming range join: BOTH sides
    carry a watermark and the join condition bounds the time skew, so
    Spark can expire join state — each side buffers only rows within
    (watermark + window) of the stream head, never the whole history.
    Without the range term the state store would grow unboundedly (the
    batch recast in operators/rangejoin.py has the same two
    ingredients as bucket key + filter; here they become state-expiry
    conditions). Column names must be disjoint apart from ``on``."""
    l = (
        spark.readStream.schema(left_schema).parquet(left_dir)
        .withColumn(left_time, F.col(left_time).cast("timestamp"))
        .withWatermark(left_time, watermark)
    )
    r = (
        spark.readStream.schema(right_schema).parquet(right_dir)
        .withColumn(right_time, F.col(right_time).cast("timestamp"))
        .withWatermark(right_time, watermark)
        .withColumnRenamed(on, f"_r_{on}")
    )
    lo = F.col(left_time) + F.make_interval(secs=F.lit(float(low_offset_s)))
    hi = F.col(left_time) + F.make_interval(secs=F.lit(float(high_offset_s)))
    cond = (
        (F.col(on) == F.col(f"_r_{on}"))
        & (F.col(right_time) >= lo)
        & (F.col(right_time) <= hi)
    )
    return l.join(r, cond, "inner").drop(f"_r_{on}")
