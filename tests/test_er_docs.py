"""Flagship query invariants (er01/er02 over the documents table):
cluster output partitions the doc space, member lists are consistent,
the trained-scorer path is active, and the scorer falls back to
training when no artifact exists."""

import os

import pytest
from pyspark.sql import functions as F

from smaph_spark.ops import er_docs
from smaph_spark.plans.star_queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def er01(spark):
    return QUERIES["er01_document_clusters"].fn(spark, SF).collect()


def test_er01_partitions_doc_space(spark, er01):
    """Every doc appears in exactly one cluster; sizes add up."""
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    members = []
    for r in er01:
        ids = [int(x) for x in r["member_docs"].split(",")]
        assert len(ids) == r["cluster_size"]
        assert r["canonical_doc"] == min(ids)  # min-id labeling
        members.extend(ids)
    assert len(members) == n_docs
    assert len(set(members)) == n_docs  # a doc is in exactly one cluster


def test_er01_member_docs_is_string(er01):
    """Driver-gate regression (round-1 red row): member_docs must be a
    scalar string, never array<long>."""
    assert all(isinstance(r["member_docs"], str) for r in er01)


def test_er02_pairs_canonical_and_scored(spark):
    rows = QUERIES["er02_document_match_pairs"].fn(spark, SF).collect()
    assert rows, "expected some matched pairs at sf0.001"
    for r in rows:
        assert r["a_doc"] < r["b_doc"]
        assert 0.0 <= r["score"] <= 1.0


def test_flagship_uses_trained_scorer(spark):
    model, threshold = er_docs.get_document_scorer(spark)
    # the GBT path, not the rule fallback
    assert type(model).__name__ == "PipelineModel"
    assert 0.0 < threshold < 1.0
    assert os.path.exists(os.path.join(er_docs._MODEL_PATH, "scorer_meta.json"))


def test_scorer_fallback_trains_when_artifact_missing(spark, monkeypatch, tmp_path):
    """No committed artifact -> train on the synthetic gold corpus and
    persist to the (temporary) path."""
    monkeypatch.setattr(er_docs, "_MODEL_PATH", str(tmp_path / "scorer"))
    monkeypatch.setattr(er_docs, "_SCORER_CACHE", {})
    import smaph_spark.operators.model_io as mio

    orig = mio.train_default_scorer

    def quick(spark_, **kw):
        kw.update(n_clusters=20)
        return orig(spark_, **kw)

    monkeypatch.setattr(mio, "train_default_scorer", quick)
    model, threshold = er_docs.get_document_scorer(spark)
    assert type(model).__name__ == "PipelineModel"
    # persisted for the next run
    assert os.path.exists(str(tmp_path / "scorer" / "scorer_meta.json"))

def test_committed_artifact_matches_flagship_feature_config():
    """Train/serve skew guard (round-2 ADVICE): the committed scorer
    must record the feature fingerprint of _DOC_CFG — the config whose
    features it is applied to in run_document_er."""
    from smaph_spark.operators.model_io import load_scorer_meta

    meta = load_scorer_meta(er_docs._MODEL_PATH)
    assert meta["train_feature_fingerprint"] == \
        er_docs._DOC_CFG.feature_fingerprint()
    assert meta["train_cfg"]["shingle_k"] == er_docs._DOC_CFG.shingle_k
    assert meta["train_cfg"]["num_minhash"] == er_docs._DOC_CFG.num_minhash


def test_scorer_retrains_on_feature_fingerprint_mismatch(
    spark, monkeypatch, tmp_path
):
    """An artifact trained under a DIFFERENT feature config must be
    rejected and retrained, not silently applied (round-2 ADVICE)."""
    from smaph_spark.config import ERConfig
    import smaph_spark.operators.model_io as mio

    calls = {"n": 0}
    orig = mio.train_default_scorer

    def quick(spark_, **kw):
        calls["n"] += 1
        kw.update(n_clusters=20)
        return orig(spark_, **kw)

    monkeypatch.setattr(mio, "train_default_scorer", quick)
    monkeypatch.setattr(er_docs, "_MODEL_PATH", str(tmp_path / "scorer"))
    monkeypatch.setattr(er_docs, "_SCORER_CACHE", {})
    # plant an artifact trained under the DEFAULT config (shingle_k=7,
    # num_minhash=128) — a different feature distribution than _DOC_CFG
    model, thr, stats, _ = quick(spark, cfg=ERConfig())
    mio.save_scorer(model, str(tmp_path / "scorer"), thr, stats,
                    train_cfg=ERConfig())
    assert calls["n"] == 1
    er_docs.get_document_scorer(spark)
    assert calls["n"] == 2, "fingerprint mismatch must trigger a retrain"
    # artifact-write policy (round-5 review): the retrain is IN-MEMORY
    # — the present-but-mismatched artifact is NOT overwritten at query
    # time (scripts/train_scorer.py resolves the skew deliberately)
    meta = mio.load_scorer_meta(str(tmp_path / "scorer"))
    assert meta["train_feature_fingerprint"] == \
        ERConfig().feature_fingerprint()


def test_er01_er02_share_one_pipeline_run(spark):
    """er01 and er02 both consume the flagship pipeline; the driver
    executing both must pay blocking+scoring once (round-2 VERDICT
    item 6): the PipelineResult is cached per (app, sf_dir)."""
    res1, ids1 = er_docs.run_document_er(spark, SF)
    res2, ids2 = er_docs.run_document_er(spark, SF)
    assert res1 is res2 and ids1 is ids2


def test_er04_incremental_equals_full_flagship(spark):
    """Folding the 20% delta into the resolved 80% history must yield
    EXACTLY the full-batch flagship clustering (same GBT scorer path),
    and er04's summary must agree with the full run's."""
    from dataclasses import replace

    from smaph_spark.config import ERConfig  # noqa: F401 (style parity)
    from smaph_spark.ops.er_docs import (
        _DOC_CFG, documents_as_files, get_document_scorer,
    )
    from smaph_spark.ops.sampling import hash_bucket
    from smaph_spark.pipeline import ERPipeline

    files = documents_as_files(spark, SF)
    b = hash_bucket(F.col("doc_id"), 10)
    history = files.filter(b < 8).drop("doc_id")
    delta = files.filter(b >= 8).drop("doc_id")
    model, threshold = get_document_scorer(spark)
    cfg = replace(_DOC_CFG, match_threshold=threshold)

    full = ERPipeline(spark, cfg, scorer_model=model).run(files.drop("doc_id"))
    hist_res = ERPipeline(spark, cfg, scorer_model=model).run(history)
    inc = ERPipeline(spark, cfg, scorer_model=model).run_incremental(
        history, delta, hist_res.clusters
    )
    full_set = {(r["record_id"], r["cluster_id"]) for r in full.clusters.collect()}
    inc_set = {(r["record_id"], r["cluster_id"]) for r in inc.clusters.collect()}
    assert inc_set == full_set

    # the MinHash+GBT incremental flagship emits membership-level rows
    # (round-3 VERDICT item 2): they must be EXACTLY er01's — the
    # incremental path resolves the same corpus, so canonical docs,
    # sizes, and member lists all agree
    inc_rows = {
        (r["canonical_doc"], r["cluster_size"], r["member_docs"])
        for r in er_docs.incremental_minhash_membership(spark, SF).collect()
    }
    er01_rows = {
        (r["canonical_doc"], r["cluster_size"], r["member_docs"])
        for r in QUERIES["er01_document_clusters"].fn(spark, SF).collect()
    }
    assert inc_rows == er01_rows


def test_er04_incremental_equals_batch_tokenband(spark):
    """er04 (round-4 VERDICT item 1): the incremental fold over the
    deterministic token-band graph — history CC, then O(delta) edges +
    history pseudo-edges — must reproduce er03's batch clustering
    row-for-row; the driver additionally hash-pins it against the
    recursive-CTE DuckDB oracle."""
    er04_rows = {
        tuple(r) for r in
        QUERIES["er04_incremental_clusters"].fn(spark, SF).collect()
    }
    er03_rows = {
        tuple(r) for r in
        QUERIES["er03_tokenband_graph_clusters"].fn(spark, SF).collect()
    }
    assert er04_rows == er03_rows


def test_tokenband_component_edges_equivalent(spark):
    """Round-6 optimization guard: the closure-equivalent sparse edge
    set (_tokenband_component_edges — group spokes + representative
    links) must yield EXACTLY the labels of connected components over
    the full banded candidate pairs, at a scale where multi-group
    chains exist (sf0.01). er04/er06/er07 rely on this equivalence."""
    from dataclasses import replace

    from smaph_spark.config import ERConfig
    from smaph_spark.operators.clustering import connected_components
    from smaph_spark.ops.er_docs import (
        _tokenband_candidate_pairs, _tokenband_component_edges,
        _tokenband_docs,
    )

    t = _tokenband_docs(spark, "/root/testdata/sf0.01")
    recs = t.select(F.col("doc_id").alias("record_id"))
    cfg = ERConfig()
    full, _ = connected_components(
        _tokenband_candidate_pairs(t).select("left_id", "right_id"),
        cfg, all_records=recs,
    )
    sparse, _ = connected_components(
        _tokenband_component_edges(t), cfg, all_records=recs,
    )
    # and the sparse set must ALSO survive the forced-distributed path
    sparse_dist, _ = connected_components(
        _tokenband_component_edges(t),
        replace(cfg, cc_local_threshold=0), all_records=recs,
    )
    f = {(r["record_id"], r["cluster_id"]) for r in full.collect()}
    s = {(r["record_id"], r["cluster_id"]) for r in sparse.collect()}
    d = {(r["record_id"], r["cluster_id"]) for r in sparse_dist.collect()}
    assert f == s
    assert f == d


def test_er05_blocking_quality_invariants(spark):
    """Reduction ratio is a true blocking-efficiency number: candidate
    pairs never exceed the all-pairs baseline, ratios live in [0, 1],
    and singleton groups report NULL (no pairs to reduce)."""
    rows = QUERIES["er05_blocking_quality"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        n = r["n_records"]
        assert r["n_total_pairs"] == n * (n - 1) // 2
        assert 0 <= r["n_candidate_pairs"] <= r["n_total_pairs"]
        if n < 2:
            assert r["reduction_ratio"] is None
        else:
            assert 0.0 <= r["reduction_ratio"] <= 1.0
    # blocking must actually reduce somewhere on the real corpus
    assert any(
        r["reduction_ratio"] and r["reduction_ratio"] > 0 for r in rows
    )
