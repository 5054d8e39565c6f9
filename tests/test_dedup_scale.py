"""Scale-safety tests for the dedup operators (round-1 VERDICT items
2/3/5): hot band keys are capped/salted with logged metrics, the dd02
prefix filter is exact vs brute force on an adversarial corpus, and the
distributed cosine self-join matches a numpy brute force."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from smaph_spark.config import ERConfig
from smaph_spark.ops.dedup import (
    _make_simhash_udf,
    cosine_self_join,
    minhash_lsh_pairs,
    simhash_pairs,
)
from smaph_spark.plans.star_queries import QUERIES


def test_minhash_lsh_hot_band_capped(spark):
    """Plant a degenerate band key shared by every doc: the pair stage
    must stay bounded (salted sub-blocks) and the cap must be logged,
    never silent."""
    n = 60
    cfg = ERConfig(max_block_size=10, block_salt_buckets=4, lsh_bands=2,
                   num_minhash=4)
    # hand-built fingerprints: every doc shares band "HOT" in band 0,
    # distinct values in band 1 → without the cap the join is O(n²)
    rows = [(i, [i, i, i, i], [7777, 1000 + i]) for i in range(n)]
    fp = spark.createDataFrame(
        rows, "doc_id long, minhash array<int>, bands array<long>"
    )
    pairs, metrics = minhash_lsh_pairs(fp, cfg)
    acts = {r["action"]: r["n_records"] for r in metrics.collect()}
    assert "salted" in acts or "dropped" in acts, "hot band must be logged"
    # bounded: each salt bucket holds ~n/4 docs; all-pairs would be 1770
    n_cand = pairs.count()
    max_per_bucket = -(-n // 4) + cfg.max_block_size
    assert n_cand <= 4 * max_per_bucket * (max_per_bucket - 1) / 2


def test_simhash_hot_chunk_capped(spark):
    n = 80
    cfg = ERConfig(max_block_size=8, block_salt_buckets=4)
    # all-identical simhash → every chunk key is one hot block of n docs
    sig = spark.createDataFrame(
        [(i, 0x1234_5678_9ABC_DEF0) for i in range(n)], "doc_id long, sim long"
    )
    pairs, metrics = simhash_pairs(sig, cfg)
    assert metrics.count() > 0, "hot chunk keys must be logged"
    all_pairs = n * (n - 1) // 2
    assert pairs.count() < all_pairs  # salting bounded the block joins


def _brute_force_jaccard(texts, thr=0.2):
    def grams(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    out = set()
    sets = {i: grams(t) for i, t in texts if len(t.split()) >= 3}
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            inter = len(a & b)
            jac = inter / (len(a) + len(b) - inter)
            if jac >= thr:
                out.add((ids[i], ids[j]))
    return out


def test_dd02_prefix_filter_exact_vs_bruteforce(spark, tmp_path):
    """Adversarial near-dup corpus: the PPJoin prefix filter must find
    EXACTLY the brute-force >= 0.2 Jaccard pairs (the filter prunes
    candidates, never answers)."""
    rng = np.random.default_rng(13)
    vocab = [f"w{k}" for k in range(50)]
    texts = []
    base_docs = []
    for i in range(30):
        doc = list(rng.choice(vocab, size=rng.integers(8, 20)))
        base_docs.append(doc)
        texts.append((i, " ".join(doc)))
    # near-dups: mutate a few tokens of existing docs
    for i in range(30, 60):
        src = list(base_docs[int(rng.integers(0, 30))])
        for _ in range(int(rng.integers(0, 3))):
            src[int(rng.integers(0, len(src)))] = str(rng.choice(vocab))
        texts.append((i, " ".join(src)))
    pdf = pd.DataFrame(
        {
            "doc_id": [i for i, _ in texts],
            "text": [t for _, t in texts],
            "lang": "en",
            "source": "synth",
        }
    )
    sf = str(tmp_path / "sf")
    spark.createDataFrame(pdf).write.parquet(f"{sf}/documents.parquet")
    got = {
        (r["a_doc"], r["b_doc"])
        for r in QUERIES["dd02_ngram_jaccard_pairs"].fn(spark, sf).collect()
    }
    want = _brute_force_jaccard(texts)
    assert got == want


def test_cosine_self_join_matches_bruteforce(spark):
    """Distributed block-matrix GEMM == numpy all-pairs (exact op)."""
    rng = np.random.default_rng(7)
    n, d = 120, 16
    mat = rng.standard_normal((n, d))
    mat[5] = mat[3] + 0.01 * rng.standard_normal(d)  # planted near-dup
    mat[50] = 0.0  # zero vector edge case
    e = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "emb": list(mat)})
    )
    got = {
        (r["a_vec"], r["b_vec"]): r["cos_raw"]
        for r in cosine_self_join(e, threshold=0.6, n_buckets=5).collect()
    }
    nrm = np.sqrt((mat * mat).sum(axis=1))
    nrm[nrm == 0] = 1.0
    unit = mat / nrm[:, None]
    sims = unit @ unit.T
    want = {
        (i, j): sims[i, j]
        for i in range(n)
        for j in range(i + 1, n)
        if sims[i, j] >= 0.6
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_dd05_plan_is_distributed(spark):
    """Regression (round-1 VERDICT): dd05 must not collect the table to
    the driver — the plan runs the GEMM via cogrouped pandas, and
    building the plan triggers no job."""
    df = QUERIES["dd05_embedding_dup_pairs"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan


def test_dd02_plan_has_no_block_only_join(spark):
    """Regression: the candidate join must be keyed on a content-derived
    prefix n-gram, not on (lang, source) alone."""
    df = QUERIES["dd02_ngram_jaccard_pairs"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the self-join condition includes the exploded prefix gram column
    assert plan.count("array_sort") >= 1 and "slice" in plan


def test_dd06_lsh_recall_vs_exact(spark):
    """LSH-prefiltered near-dup must recover a solid fraction of the
    exact >= 0.4 pairs and NEVER emit a below-threshold pair (the
    rerank is exact)."""
    exact = {
        (r["a_vec"], r["b_vec"])
        for r in QUERIES["dd05_embedding_dup_pairs"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    approx_rows = QUERIES["dd06_embedding_dup_lsh"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    approx = {(r["a_vec"], r["b_vec"]) for r in approx_rows}
    assert approx <= exact, "rerank must make every emitted pair exact"
    assert exact, "fixture should contain near-dup pairs"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"LSH near-dup recall {recall:.2f}"


def test_standalone_dedup_queries_log_cap_metrics(spark, tmp_path):
    """The registered dd03/dd04/dd06 queries must SURFACE their band-cap
    counts (round-2 VERDICT item 5: the counts were computed and
    discarded). Planted hot key: every doc shares one band."""
    import smaph_spark.ops.dedup as dd

    n = 40
    rows = [(i, [i, i, i, i], [7777, 1000 + i]) for i in range(n)]
    fp = spark.createDataFrame(
        rows, "doc_id long, minhash array<int>, bands array<long>"
    )
    cfg = ERConfig(max_block_size=10, block_salt_buckets=4, lsh_bands=2,
                   num_minhash=4)
    pairs, metrics = minhash_lsh_pairs(fp, cfg)
    out = dd.log_cap_metrics("test_hot_band", metrics)
    assert out["salted_band_keys"] + out["dropped_band_keys"] > 0
    assert dd.CAP_METRICS["test_hot_band"] == out
    # and the registered driver queries populate CAP_METRICS end-to-end
    dd.CAP_METRICS.clear()
    QUERIES["dd03_minhash_lsh_pairs"].fn(spark, "/root/testdata/sf0.001").count()
    assert "dd03_minhash_lsh_pairs" in dd.CAP_METRICS
