"""As-of join: match each left row to the most recent right row at or
before its timestamp, per key.

Spark has no ASOF JOIN operator (DuckDB/kdb do); the reference has no
streaming/temporal ops either — this is one of the beyond-the-reference
training-data-pipeline operators (feature backfill: "the latest profile
/ model / price as of this example's event time").

Implementation is the scale-idiomatic UNION + WINDOW recast, not a
range join: tag both sides, shuffle ONCE on the join key, sort each
partition by (t, side) and propagate the last seen right-side payload
with ``last(ignorenulls)`` over an unbounded-preceding window. Cost =
one shuffle of |L|+|R| rows + a partition-local sort — contrast a naive
``L JOIN R ON key AND r.t <= l.t`` theta join (per-key cross product,
quadratic in hot keys) or per-key ``collect_list`` (unbounded row
state). Skewed keys behave like any single-shuffle window query (AQE);
the window itself is streaming (no frame re-scan per row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
    strict: bool = False,
    how: str = "inner",
) -> DataFrame:
    """For every ``left`` row: the ``right`` row's payload with the
    greatest ``right_time`` <= ``left_time`` (< if ``strict``) and the
    same ``on`` key.

    Returns all left columns + ``asof_time`` + the requested right
    payload columns. ``how='inner'`` drops left rows with no prior
    right row; ``'left'`` keeps them with nulls. Among right rows tied
    on (key, time), payload columns follow the sort's last tied row —
    callers needing a deterministic tie-break should pre-aggregate the
    right side to one row per (key, time) (the oracle-paired q22 query
    projects only asof_time, which is always deterministic).
    """
    payload_cols = payload_cols or []
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: how must be 'inner' or 'left', got {how!r}")
    # the output is *left.columns + payload columns under their original
    # names — a collision would silently produce duplicate columns
    collisions = set(payload_cols) & set(left.columns)
    if collisions:
        raise ValueError(
            "asof_join: payload columns collide with left columns "
            f"{sorted(collisions)}; alias them on the right side first"
        )
    if "asof_time" in left.columns or "asof_time" in payload_cols:
        raise ValueError(
            "asof_join: 'asof_time' is reserved for the output match "
            "timestamp; rename the conflicting input column"
        )
    # side marker orders same-timestamp rows: inclusive (>=) wants the
    # right row BEFORE the left row at equal t; strict (>) the reverse
    r_mark, l_mark = (0, 1) if not strict else (1, 0)
    # NULL join keys never match (SQL equi-join semantics): drop them
    # from the right side up front; null-key left rows then see an
    # empty window -> dropped under 'inner', null payload under 'left'
    right = right.filter(F.col(on).isNotNull())
    # the whole right row rides in ONE struct so last(ignorenulls) can
    # never stitch fields from different rows: a right row whose
    # payload value is legitimately NULL still has a non-null struct,
    # only the left-side placeholder rows (struct-NULL) are skipped.
    # The internal time field dodges payload names at runtime (a
    # payload literally named '_time' would otherwise make the struct
    # field extraction ambiguous)
    tfield = "_time"
    while tfield in payload_cols:
        tfield = "_" + tfield
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(r_mark).alias("_side"),
        F.struct(
            F.col(right_time).alias(tfield),
            *[F.col(c).alias(c) for c in payload_cols],
        ).alias("_r"),
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(l_mark).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c) for c in left.columns],
    )
    # align schemas for the union (left carries its own columns; the
    # right side carries nulls for them)
    for c in left.columns:
        if c not in [f.name for f in r.schema.fields]:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.select(*[f.name for f in l.schema.fields])
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof = F.last("_r", ignorenulls=True).over(w)
    out = unioned.select(
        *left.columns,
        F.col("_side").alias("_is_left"),
        asof[tfield].alias("asof_time"),
        *[asof[c].alias(c) for c in payload_cols],
    ).filter(F.col("_is_left") == l_mark).drop("_is_left")
    if how == "inner":
        out = out.filter(F.col("asof_time").isNotNull())
    return out
