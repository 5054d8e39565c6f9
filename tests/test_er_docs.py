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
