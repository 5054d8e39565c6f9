"""A9 parity: macro vs micro P/R/F1 + bootstrap std on a hand-built
fixture (SolutionComputer.java:33-184, RunBenchmark.java:240-247)."""

import pytest

from smaph_spark.operators.metrics import grouped_prf


def _fixture(spark):
    # group A: perfect (2 gold pairs, both predicted)
    # group B: half precision (1 gold pair predicted + 1 false positive)
    # group C: zero recall (1 gold pair, nothing predicted)
    gold = spark.createDataFrame(
        [
            ("A", 1, 2, True), ("A", 1, 3, True),
            ("B", 10, 11, True),
            ("C", 20, 21, True),
        ],
        "g string, left_id long, right_id long, is_match boolean",
    )
    pred = spark.createDataFrame(
        [
            ("A", 1, 2), ("A", 1, 3),
            ("B", 10, 11), ("B", 10, 12),
        ],
        "g string, left_id long, right_id long",
    )
    return pred, gold


def test_macro_micro_differ_on_skewed_groups(spark):
    pred, gold = _fixture(spark)
    m = grouped_prf(pred, gold, "g", n_bootstrap=0)
    # micro: tp=3, fp=1, fn=1
    assert m["tp"] == 3 and m["fp"] == 1 and m["fn"] == 1
    assert m["micro"]["precision"] == pytest.approx(3 / 4)
    assert m["micro"]["recall"] == pytest.approx(3 / 4)
    # macro: per-group P = (1, 1/2, 1) -> 5/6; R = (1, 1, 0) -> 2/3
    # (empty prediction set -> P=1, the BAT convention)
    assert m["macro"]["precision"] == pytest.approx(5 / 6)
    assert m["macro"]["recall"] == pytest.approx(2 / 3)
    # per-group F1 = (1, 2/3, 0) -> 5/9
    assert m["macro"]["f1"] == pytest.approx(5 / 9)
    assert m["micro"]["f1"] == pytest.approx(3 / 4)


def test_bootstrap_std_seeded_and_sane(spark):
    pred, gold = _fixture(spark)
    m1 = grouped_prf(pred, gold, "g", n_bootstrap=100, seed=7)
    m2 = grouped_prf(pred, gold, "g", n_bootstrap=100, seed=7)
    assert m1["bootstrap_std"] == m2["bootstrap_std"]  # deterministic
    # skewed per-group metrics -> nonzero spread, bounded by the range
    assert 0.0 < m1["bootstrap_std"]["macro"]["f1"] < 0.5
    assert 0.0 < m1["bootstrap_std"]["micro"]["f1"] < 0.5


def test_perfect_prediction_zero_std(spark):
    gold = spark.createDataFrame(
        [("A", 1, 2, True), ("B", 3, 4, True)],
        "g string, left_id long, right_id long, is_match boolean",
    )
    pred = gold.drop("is_match")
    m = grouped_prf(pred, gold, "g", n_bootstrap=50)
    assert m["macro"]["f1"] == 1.0 and m["micro"]["f1"] == 1.0
    assert m["bootstrap_std"]["macro"]["f1"] == 0.0


def test_grouped_prf_caps_driver_collect(spark):
    """Above max_groups the driver-side bootstrap runs on a
    deterministic hash-sample of groups, with a warning — never an
    unbounded collect (round-2 VERDICT item 9)."""
    from pyspark.sql import functions as F

    gold = (
        spark.range(500)
        .select(
            F.concat(F.lit("g"), F.col("id")).alias("g"),
            F.lit(1).cast("long").alias("left_id"),
            F.lit(2).cast("long").alias("right_id"),
            F.lit(True).alias("is_match"),
        )
    )
    pred = gold.drop("is_match")
    with pytest.warns(RuntimeWarning, match="max_groups"):
        m = grouped_prf(pred, gold, "g", n_bootstrap=10, max_groups=100)
    assert m["groups_sampled"] is True
    assert m["n_groups_total"] == 500
    assert m["n_groups"] < 500  # bounded collect
    assert m["macro"]["f1"] == 1.0  # sample of perfect groups is perfect
    # under the cap: full collect, no sampling
    m2 = grouped_prf(pred, gold, "g", n_bootstrap=10, max_groups=1000)
    assert m2["groups_sampled"] is False and m2["n_groups"] == 500


def test_bcubed_hand_computed(spark):
    """Bagga & Baldwin worked example: pred {a,b},{c} vs gold
    {a},{b,c} -> P = (0.5+0.5+1)/3 = 2/3, R = (1+0.5+0.5)/3 = 2/3."""
    from smaph_spark.operators.metrics import bcubed_prf

    pred = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 2)], "record_id string, cluster_id long"
    )
    gold = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 20)], "record_id string, cluster_id long"
    )
    row = bcubed_prf(pred, gold).collect()[0]
    assert row["n_records"] == 3
    assert row["bcubed_precision"] == round(2 / 3, 6)
    assert row["bcubed_recall"] == round(2 / 3, 6)
    assert row["bcubed_f1"] == round(2 / 3, 6)

    # identical clusterings score exactly 1.0 everywhere
    perfect = bcubed_prf(pred, pred).collect()[0]
    assert (perfect["bcubed_precision"], perfect["bcubed_recall"],
            perfect["bcubed_f1"]) == (1.0, 1.0, 1.0)


def test_er07_bcubed_duckdb_parity(spark):
    """er07 is rows-only at the driver (window full): its DuckDB twin
    is pinned here with the driver's exact comparison."""
    from smaph_spark.ops.er_docs import ER07_SQL
    from smaph_spark.plans.parity import check_query
    from smaph_spark.plans.star_queries import QUERIES

    spec = QUERIES["er07_bcubed_eval"]
    res = check_query(
        spark, "/root/testdata/sf0.001", "er07_bcubed_eval", spec.fn,
        ER07_SQL,
    )
    assert res["ok"], res


def test_bcubed_coverage_contract_enforced(spark):
    """Round-5 review: mismatched record coverage or duplicate ids
    must raise, not silently mis-score over the joined subset."""
    import pytest as _pytest

    pred = spark.createDataFrame(
        [("a", 1), ("b", 1)], "record_id string, cluster_id long"
    )
    gold3 = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 20)], "record_id string, cluster_id long"
    )
    from smaph_spark.operators.metrics import bcubed_prf

    with _pytest.raises(ValueError, match="same records"):
        bcubed_prf(pred, gold3)
    dup = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1)], "record_id string, cluster_id long"
    )
    with _pytest.raises(ValueError, match="same records"):
        bcubed_prf(dup, gold3)


def test_bcubed_rejects_null_record_ids(spark):
    """Round-5 review: count()/count_distinct skip NULLs, so a NULL id
    needs its own guard — it would otherwise be silently dropped by
    the join while the coverage check passes."""
    import pytest as _pytest

    from smaph_spark.operators.metrics import bcubed_prf

    pred = spark.createDataFrame(
        [(None, 1), ("a", 1)], "record_id string, cluster_id long"
    )
    gold = spark.createDataFrame(
        [("a", 10)], "record_id string, cluster_id long"
    )
    with _pytest.raises(ValueError, match="NULL record_id"):
        bcubed_prf(pred, gold)
