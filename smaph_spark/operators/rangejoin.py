"""Bucketed interval (range) join.

Spark has no range-join optimization: a join whose ONLY predicate is
``r.t BETWEEN l.t + lo AND l.t + hi`` falls back to
BroadcastNestedLoopJoin — O(|L| x |R|) comparisons, the at-scale
killer. The standard recast (cf. the bin-based range-join strategy in
the public Databricks/Flink literature) makes it an equi-join:

- build side: each right row keyed by its time bucket
  ``floor(t / bucket)``;
- probe side: each left row EXPLODES to the buckets its window
  ``[t+lo, t+hi]`` overlaps (``(hi-lo)/bucket + 1`` rows — choose
  ``bucket`` on the order of the window width so this stays 2-3);
- shuffle hash join on the bucket key, then the EXACT window predicate
  filters the candidates.

Work drops from |L|x|R| to sum-over-buckets of |L_b|x|R_b| — linear
for time-spread data — and both shuffles key on time buckets, which
are naturally balanced for event streams. Hot buckets (load spikes)
can reuse cap_and_salt_blocks like every other blocked join here.

Reference analogue: none (request/response system); this is one of the
beyond-reference temporal operators (with the as-of join,
operators/asof.py) the 100 TB training-data mission needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    low_offset_s: int,
    high_offset_s: int,
    bucket_s: int | None = None,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Inner join: every (l, r) with
    ``l[left_time] + low_offset_s <= r[right_time] <= l[left_time] +
    high_offset_s`` (plus optional equi-columns ``extra_on``). Returns
    all columns of both inputs. ``bucket_s`` defaults to the window
    width (so each probe row explodes to exactly 2 buckets)."""
    if high_offset_s < low_offset_s:
        raise ValueError("high_offset_s must be >= low_offset_s")
    if bucket_s is None:
        bucket_s = max(high_offset_s - low_offset_s, 1)

    l_epoch = F.unix_timestamp(F.col(left_time))
    r_epoch = F.unix_timestamp(F.col(right_time))
    probe = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor((l_epoch + low_offset_s) / bucket_s),
                F.floor((l_epoch + high_offset_s) / bucket_s),
            )
        ),
    )
    build = right.withColumn("_bucket", F.floor(r_epoch / bucket_s))
    on = ["_bucket"] + (extra_on or [])
    lo = F.col(left_time) + F.make_interval(secs=F.lit(float(low_offset_s)))
    hi = F.col(left_time) + F.make_interval(secs=F.lit(float(high_offset_s)))
    return (
        probe.join(build, on)
        .filter(F.col(right_time).between(lo, hi))
        .drop("_bucket")
    )
