"""Scorer goldens: z-score degenerate rule
(ZScoreFeatureNormalizer.java:77-92), GBT training path (M2 — replaces
the RBF-SVM per north_star), monotone-ranking sanity
(RankLibModelTest.java:52-75 recast), threshold sweep (W7)."""

import pytest
from pyspark.sql import functions as F

from smaph_spark.config import ERConfig
from smaph_spark.operators.pairs import FEATURE_COLS
from smaph_spark.operators.scoring import (
    apply_zscore,
    fit_zscore,
    gbt_score,
    sweep_threshold,
    train_gbt_scorer,
)


def test_zscore_degenerate_sigma(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], ["a", "b"]
    )
    stats = fit_zscore(df, ["a", "b"])
    mu_a, sigma_a = stats["a"]
    mu_b, sigma_b = stats["b"]
    assert mu_a == pytest.approx(2.0) and sigma_a > 0
    assert mu_b == pytest.approx(5.0) and sigma_b == 0.0

    out = apply_zscore(df, stats).collect()
    # σ=0 → x−μ (NOT NaN/inf), matching the reference rule
    assert all(r["b"] == pytest.approx(0.0) for r in out)
    a_vals = sorted(r["a"] for r in out)
    assert a_vals[1] == pytest.approx(0.0)


def test_zscore_unseen_feature_defaults_zero(spark):
    df = spark.createDataFrame([(1.0,)], ["a"])
    out = apply_zscore(df, {"a": (1.0, 0.0), "ghost": (9.9, 1.0)})
    row = out.collect()[0]
    assert row["ghost"] == 0.0


def _labeled_pairs(spark, n=400, seed=7):
    """Synthetic feature packs: matches have high jaccard/name sim."""
    import random

    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        is_match = i % 2 == 0
        base = 0.75 if is_match else 0.15
        rows.append(
            (
                i, n + i, "b",
                min(1.0, max(0.0, base + rnd.gauss(0, 0.08))),  # jaccard_est
                min(1.0, max(0.0, base + rnd.gauss(0, 0.1))),   # name_jw
                1.0 - base,                                      # path_ned
                base,                                            # size_ratio
                base,                                            # token_ratio
                1.0,                                             # same_lang
                0.0,                                             # sha_eq
                is_match,
            )
        )
    return spark.createDataFrame(
        rows,
        ["left_id", "right_id", "block_key", *FEATURE_COLS, "is_match"],
    )


def test_gbt_training_and_scoring(spark):
    labeled = _labeled_pairs(spark)
    model = train_gbt_scorer(labeled, max_iter=10)
    scored = gbt_score(model, labeled)
    assert "score" in scored.columns
    agg = scored.groupBy("is_match").agg(F.avg("score").alias("s")).collect()
    by = {r["is_match"]: r["s"] for r in agg}
    assert by[True] > 0.8 > 0.2 > by[False]


def test_gbt_monotone_ranking(spark):
    """Order-only assertion (RankLibModelTest recast): a pack that
    dominates feature-wise must outrank a dominated pack."""
    labeled = _labeled_pairs(spark)
    model = train_gbt_scorer(labeled, max_iter=10)
    probe = spark.createDataFrame(
        [
            (1, 2, "b", 0.95, 0.9, 0.1, 0.9, 0.9, 1.0, 0.0, True),
            (3, 4, "b", 0.05, 0.1, 0.9, 0.2, 0.2, 1.0, 0.0, False),
        ],
        ["left_id", "right_id", "block_key", *FEATURE_COLS, "is_match"],
    )
    out = {r["left_id"]: r["score"] for r in gbt_score(model, probe).collect()}
    assert out[1] > out[3]


def test_threshold_sweep_plateau(spark):
    labeled = _labeled_pairs(spark)
    scored = labeled.withColumn(
        "score", F.col("jaccard_est")
    ).withColumn("is_match_gold", F.col("is_match"))
    thr, stats = sweep_threshold(scored, steps=20)
    # separable data → sweep finds a threshold between the two modes
    assert 0.25 < thr < 0.75
    best = max(r["f1"] for r in stats.collect())
    assert best > 0.95


def test_minmax_goldens_and_degenerate_rules(spark):
    """ScaleFeatureNormalizer.java:24-67 goldens: x maps onto [-1, 1]
    via (x-min)/(max-min)*2-1; degenerate range (max==min) -> 0.0; a
    feature with no fitted range passes through raw; an absent feature
    column -> 0.0 (featureIsSet false)."""
    from smaph_spark.operators.scoring import apply_minmax, fit_minmax

    df = spark.createDataFrame(
        [(1.0, 5.0, None), (2.0, 5.0, None), (3.0, 5.0, None)],
        "a double, b double, c double",
    )
    stats = fit_minmax(df, ["a", "b", "c"])
    assert stats["a"] == (1.0, 3.0)
    assert stats["b"] == (5.0, 5.0)
    assert stats["c"] == (None, None)  # all-NULL -> no range recorded

    out = apply_minmax(df, stats).orderBy("a").collect()
    # endpoints land exactly on -1/+1, the midpoint on 0 (x2-1 scale,
    # NOT [0,1]: the reference multiplies by 2 and subtracts 1)
    assert [r["a"] for r in out] == pytest.approx([-1.0, 0.0, 1.0])
    # degenerate range -> 0.0 (not NaN from the 0/0)
    assert all(r["b"] == 0.0 for r in out)
    # no fitted range -> raw passthrough (here NULL stays NULL)
    assert all(r["c"] is None for r in out)

    # absent feature column -> materialized as 0.0
    ghost = apply_minmax(df.select("a"), {"ghost": (0.0, 1.0)}).collect()[0]
    assert ghost["ghost"] == 0.0


def test_normalizer_registry_dispatch(spark):
    from smaph_spark.operators.scoring import (
        NORMALIZERS, apply_normalizer, fit_normalizer,
    )

    assert set(NORMALIZERS) == {"zscore", "minmax"}
    df = spark.createDataFrame([(0.0,), (4.0,)], "a double")
    mm = fit_normalizer(df, "minmax", ["a"])
    assert mm["a"] == (0.0, 4.0)
    got = sorted(
        r["a"] for r in apply_normalizer(df, "minmax", mm).collect()
    )
    assert got == pytest.approx([-1.0, 1.0])
    zs = fit_normalizer(df, "zscore", ["a"])
    assert zs["a"][0] == pytest.approx(2.0)
    with pytest.raises(KeyError):
        fit_normalizer(df, "quantile", ["a"])
    # the ML-pipeline scaler mapping lives in ONE place and never
    # silently defaults (round-5 review: the tune path had a copy that
    # fell through to z-score on unknown kinds)
    from smaph_spark.operators.scoring import make_scaler_stage

    assert type(make_scaler_stage("minmax")).__name__ == "MinMaxScaler"
    assert type(make_scaler_stage("zscore")).__name__ == "StandardScaler"
    with pytest.raises(ValueError):
        make_scaler_stage("scale")
