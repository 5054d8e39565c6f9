"""As-of join semantics + deterministic split properties (the round-3
beyond-reference training-data operators)."""

from pyspark.sql import functions as F

from smaph_spark.operators.asof import asof_join
from smaph_spark.ops.sampling import deterministic_split


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "k", 10), (2, "k", 20), (3, "k", 5), (4, "x", 50)],
        "event_id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("k", 10, 1.0), ("k", 15, 2.0), ("y", 1, 9.0)],
        "k string, rt long, price double",
    )
    return left, right


def test_asof_inclusive_inner(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["asof_time"], r["price"])
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            payload_cols=["price"],
        ).collect()
    }
    # t=10 matches rt=10 inclusively; t=20 the later rt=15; t=5 has no
    # prior row (dropped); k=x has no right rows at all (dropped)
    assert out == {1: (10, 1.0), 2: (15, 2.0)}


def test_asof_strict_and_left(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r["asof_time"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            strict=True, how="left",
        ).collect()
    }
    # strict: t=10 must NOT match rt=10; left: unmatched rows kept
    assert out == {1: None, 2: 15, 3: None, 4: None}


def test_asof_single_shuffle_plan(spark):
    """The union+window recast shuffles ONCE on the key — no join node,
    no per-key cross product (the scale contract of the operator)."""
    left, right = _frames(spark)
    plan = asof_join(
        left, right, on="k", left_time="t", right_time="rt"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_deterministic_split_properties(spark):
    d = spark.range(2000).select(F.col("id").alias("doc_id"))
    s1 = deterministic_split(d, "doc_id")
    fractions = {
        r["split"]: r["n"]
        for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert abs(fractions["train"] / 2000 - 0.8) < 0.05
    assert abs(fractions["val"] / 2000 - 0.1) < 0.03
    assert abs(fractions["test"] / 2000 - 0.1) < 0.03
    # layout-independence: same assignment after an arbitrary repartition
    # (the property rand()-based randomSplit does not have)
    a = sorted((r["doc_id"], r["split"]) for r in s1.collect())
    s2 = deterministic_split(d.repartition(13), "doc_id")
    b = sorted((r["doc_id"], r["split"]) for r in s2.collect())
    assert a == b


# ---------------------------------------------------------------------------
# Bucketed interval (range) join
# ---------------------------------------------------------------------------

def _ts_frames(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(i, "u", base + dt.timedelta(seconds=s)) for i, s in
         [(1, 0), (2, 3600), (3, 7200), (4, 7201)]],
        "lid long, u string, lt timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(j, "u", base + dt.timedelta(seconds=s)) for j, s in
         [(10, -3600), (11, -1), (12, 0), (13, 3599), (14, 3600), (15, 10000)]],
        "rid long, u string, rt timestamp_ntz",
    )
    return left, right


def test_interval_join_matches_naive(spark):
    from smaph_spark.operators.rangejoin import interval_join

    left, right = _ts_frames(spark)
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(
            left, right, "lt", "rt", -3600, 0, extra_on=["u"]
        ).collect()
    }
    # naive reference: cross + exact window (inclusive both ends)
    naive = {
        (l["lid"], r["rid"])
        for l in left.collect() for r in right.collect()
        if l["u"] == r["u"]
        and -3600 <= (r["rt"] - l["lt"]).total_seconds() <= 0
    }
    assert got == naive and len(naive) > 0
    # boundary rows included exactly once: rt == lt and rt == lt - 1h
    assert (1, 10) in got and (1, 12) in got and (1, 11) in got
    assert (2, 12) in got and (2, 14) in got


def test_interval_join_asymmetric_window_and_bucket(spark):
    from smaph_spark.operators.rangejoin import interval_join

    left, right = _ts_frames(spark)
    # forward-looking window [lt, lt+2h], odd bucket width: candidates
    # from 3+ buckets must still produce exactly the naive result
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(
            left, right, "lt", "rt", 0, 7200, bucket_s=1700, extra_on=["u"]
        ).collect()
    }
    naive = {
        (l["lid"], r["rid"])
        for l in left.collect() for r in right.collect()
        if l["u"] == r["u"]
        and 0 <= (r["rt"] - l["lt"]).total_seconds() <= 7200
    }
    assert got == naive and len(naive) > 0


def test_interval_join_plan_is_equi_join(spark):
    """The whole point: the physical plan must be a hash equi-join on
    the bucket key, never a nested-loop over the range predicate."""
    from smaph_spark.operators.rangejoin import interval_join

    left, right = _ts_frames(spark)
    plan = interval_join(
        left, right, "lt", "rt", -3600, 0, extra_on=["u"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_asof_null_payload_stays_atomic(spark):
    """A right row whose payload is legitimately NULL must be returned
    AS THAT ROW — per-column last(ignorenulls) used to stitch the
    payload from an older row (torn row)."""
    left = spark.createDataFrame([(1, "k", 20)], "event_id long, k string, t long")
    right = spark.createDataFrame(
        [("k", 5, 2.0), ("k", 10, None)], "k string, rt long, price double"
    )
    rows = asof_join(
        left, right, on="k", left_time="t", right_time="rt",
        payload_cols=["price"],
    ).collect()
    assert len(rows) == 1
    assert rows[0]["asof_time"] == 10 and rows[0]["price"] is None


def test_asof_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [(1, None, 20), (2, "k", 20)], "event_id long, k string, t long"
    )
    right = spark.createDataFrame(
        [(None, 10, 1.0), ("k", 10, 2.0)], "k string, rt long, price double"
    )
    inner = asof_join(
        left, right, on="k", left_time="t", right_time="rt",
        payload_cols=["price"],
    ).collect()
    assert [(r["event_id"], r["price"]) for r in inner] == [(2, 2.0)]
    outer = asof_join(
        left, right, on="k", left_time="t", right_time="rt",
        payload_cols=["price"], how="left",
    ).collect()
    got = {r["event_id"]: (r["asof_time"], r["price"]) for r in outer}
    assert got == {1: (None, None), 2: (10, 2.0)}


def test_asof_payload_named_time(spark):
    """A payload column literally named '_time' must not collide with
    the internal struct time field."""
    left = spark.createDataFrame([(1, "k", 20)], "event_id long, k string, t long")
    right = spark.createDataFrame(
        [("k", 10, 7)], "k string, rt long, _time long"
    )
    rows = asof_join(
        left, right, on="k", left_time="t", right_time="rt",
        payload_cols=["_time"],
    ).collect()
    assert rows[0]["asof_time"] == 10 and rows[0]["_time"] == 7


def test_asof_rejects_collisions_and_bad_how(spark):
    """Round-3 ADVICE: payload/left name collisions silently produced
    duplicate output columns, and unknown `how` values silently behaved
    as 'left' — both must raise."""
    import pytest

    left = spark.createDataFrame([(1, "k", 20)], "event_id long, k string, t long")
    right = spark.createDataFrame(
        [("k", 10, 1.0)], "k string, rt long, event_id double"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_time="t", right_time="rt",
                  payload_cols=["event_id"])
    right2 = spark.createDataFrame([("k", 10, 1.0)], "k string, rt long, price double")
    with pytest.raises(ValueError, match="how"):
        asof_join(left, right2, on="k", left_time="t", right_time="rt",
                  payload_cols=["price"], how="outer")
    left2 = spark.createDataFrame(
        [(1, "k", 20, 5)], "event_id long, k string, t long, asof_time long"
    )
    with pytest.raises(ValueError, match="asof_time"):
        asof_join(left2, right2, on="k", left_time="t", right_time="rt",
                  payload_cols=["price"])


def test_stratified_sample_fraction_not_truncated(spark):
    """Round-3 ADVICE: 0.29 * 100 floats to 28.999..., a bare
    cast('long') floored it to 28 — the threshold must round to 29."""
    from smaph_spark.ops.sampling import hash_bucket, stratified_sample

    df = spark.createDataFrame(
        [(i, "en") for i in range(2000)], "doc_id long, lang string"
    )
    kept = stratified_sample(df, "doc_id", "lang", {"en": 0.29})
    expected = df.filter(hash_bucket(F.col("doc_id"), 100) < 29)
    assert kept.count() == expected.count()
    got = {r["doc_id"] for r in kept.collect()}
    want = {r["doc_id"] for r in expected.collect()}
    assert got == want


def test_temporal_split_leakage_properties(spark):
    """ds03: every train timestamp precedes every test timestamp by at
    least the embargo, the embargo band sits strictly between, and the
    train fraction tracks the quantile."""
    import datetime

    from smaph_spark.ops.sampling import temporal_split

    base = datetime.datetime(2026, 1, 1)
    rows = [(i, base + datetime.timedelta(minutes=7 * i)) for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")
    out = temporal_split(df, "ts", train_quantile=0.8, embargo="1 hour")
    got = [(r["ts"], r["split"]) for r in out.collect()]
    assert len(got) == 500
    train_ts = [t for t, s in got if s == "train"]
    emb_ts = [t for t, s in got if s == "embargo"]
    test_ts = [t for t, s in got if s == "test"]
    assert train_ts and emb_ts and test_ts
    cutoff = max(train_ts)
    assert min(test_ts) > cutoff + datetime.timedelta(hours=1)
    assert all(cutoff < t <= cutoff + datetime.timedelta(hours=1) for t in emb_ts)
    # percentile_disc(0.8): 80% of rows at or before the cutoff
    assert abs(len(train_ts) / 500 - 0.8) < 0.01


def test_temporal_split_null_timestamps_quarantined(spark):
    """Undated rows must land in 'unknown', never in 'test' (round-4
    review: both WHEN comparisons are NULL-false, so they previously
    fell through into the eval set)."""
    import datetime

    from smaph_spark.ops.sampling import temporal_split

    base = datetime.datetime(2026, 1, 1)
    rows = [(i, base + datetime.timedelta(hours=i)) for i in range(50)]
    rows += [(100 + i, None) for i in range(3)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")
    got = {r["event_id"]: r["split"] for r in temporal_split(df, "ts").collect()}
    assert all(got[100 + i] == "unknown" for i in range(3))
    assert set(got.values()) >= {"train", "test", "unknown"}


def test_ds04_weighted_sample_matches_python_reference(spark):
    """A-ES correctness on a small fixture: selection must equal an
    independent python implementation of the same scheme (md5-derived
    u, key u^(1/w), top-k), and be layout-independent."""
    import hashlib
    import math

    from smaph_spark.ops.sampling import weighted_sample

    rows = [(i, "s", float(1 + (i * 7) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    got = {
        (r["id"], r["sample_rank"])
        for r in weighted_sample(df, "id", "w", 7, ["g"]).collect()
    }

    def es_key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (h + 1.0) / 4294967297.0
        return math.log(u) / w

    ref = sorted(rows, key=lambda r: (-es_key(r[0], r[2]), r[0]))[:7]
    want = {(r[0], i + 1) for i, r in enumerate(ref)}
    assert got == want

    # partition-layout independence (the property rand() lacks)
    again = {
        (r["id"], r["sample_rank"])
        for r in weighted_sample(
            df.repartition(13), "id", "w", 7, ["g"]
        ).collect()
    }
    assert again == got

    # non-positive weights are excluded by contract
    with_zero = df.union(spark.createDataFrame([(999, "s", 0.0)], df.schema))
    z = weighted_sample(with_zero, "id", "w", 7, ["g"]).collect()
    assert all(r["id"] != 999 for r in z)


def test_ds04_duckdb_parity(spark):
    """ds04 is rows-only at the driver (window full): its DuckDB twin
    is pinned here with the driver's exact comparison."""
    from smaph_spark.ops.sampling import DS04_SQL
    from smaph_spark.plans.parity import check_query
    from smaph_spark.plans.star_queries import QUERIES

    spec = QUERIES["ds04_weighted_sample"]
    res = check_query(
        spark, "/root/testdata/sf0.001", "ds04_weighted_sample", spec.fn,
        DS04_SQL,
    )
    assert res["ok"], res


def test_ds04_global_topk_no_full_window(spark):
    """Global (strata-less) sampling must match the single-stratum
    result and avoid the unpartitioned-window plan (round-5 review):
    the plan takes a distributed top-k, not a full-corpus window."""
    from smaph_spark.ops.sampling import weighted_sample

    rows = [(i, float(1 + (i * 11) % 30)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, w double")
    g = weighted_sample(df, "id", "w", 6)
    got = {(r["id"], r["sample_rank"]) for r in g.collect()}
    strat = weighted_sample(
        df.withColumn("s", F.lit("x")), "id", "w", 6, ["s"]
    )
    want = {(r["id"], r["sample_rank"]) for r in strat.collect()}
    assert got == want and len(got) == 6
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
