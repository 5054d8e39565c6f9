"""Deduplication operators over the `documents` table.

Large-scale training-data-pipeline ops, each exposed as a driver query
(__spark_entry__.py). Exact and n-gram/embedding variants carry DuckDB
oracles; MinHash/SimHash variants are deterministic but not
SQL-expressible (rows-only checks).

The MinHash path reuses the ER pipeline's seeded fingerprinting
(operators/normalize.py), i.e. the documents near-dup query IS the
SMAPH-graft blocking stage applied to a second corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smaph_spark.config import ERConfig
from smaph_spark.operators.normalize import make_minhash_udf
from smaph_spark.plans.star_queries import load, register

# ---------------------------------------------------------------------------
# exact dedup — hash groupBy
# ---------------------------------------------------------------------------

@register(
    "dd01_exact_duplicates",
    """
    SELECT md5(text) AS text_md5, COUNT(*) AS n_dups,
           MIN(doc_id) AS canonical_doc
    FROM documents
    GROUP BY md5(text) HAVING COUNT(*) > 1
    """,
    survey_ref="exact dedup (hash agg; S6 shape EntityToAnchors.createDB:78-158)",
)
def dd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("text_md5"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("canonical_doc"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# token n-gram Jaccard near-dup — block-local self-join, JVM set ops
# ---------------------------------------------------------------------------

@register(
    "dd02_ngram_jaccard_pairs",
    r"""
    WITH t AS (
      SELECT doc_id, lang, source,
             list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                            FOR i IN generate_series(1, greatest(len(toks)-2, 0))]) AS ngrams
      FROM (SELECT doc_id, lang, source,
                   string_split_regex(trim(text), '\s+') AS toks
            FROM documents WHERE length(trim(text)) > 0)
      WHERE len(toks) >= 3)
    SELECT a.doc_id AS a_doc, b.doc_id AS b_doc,
           ROUND(len(list_intersect(a.ngrams, b.ngrams))::DOUBLE /
                 (len(a.ngrams) + len(b.ngrams)
                  - len(list_intersect(a.ngrams, b.ngrams))), 4) AS jac
    FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source
                     AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.ngrams, b.ngrams))::DOUBLE /
          (len(a.ngrams) + len(b.ngrams)
           - len(list_intersect(a.ngrams, b.ngrams))) >= 0.2
    """,
    survey_ref="X6 n-gram segments (SmaphUtils.findSegments:426-433) as pair feature",
)
def dd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = F.split(F.trim("text"), r"\s+")
    # guard: sequence(0, n) with n<0 would yield a DESCENDING sequence
    # and element_at(toks, 0) errors — short docs get an empty array
    ngrams = F.when(
        F.size(toks) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                    F.element_at(toks, i + 3),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # hash n-grams to int64: array_intersect on longs is ~10x cheaper
    # than on strings and the arrays shrink ~10x in bytes; set
    # cardinalities (and hence Jaccard) are preserved w.h.p. (64-bit)
    hashed = F.array_distinct(F.transform(ngrams, lambda s: F.xxhash64(s)))
    # repartition on the block key: the exchange materializes the
    # n-gram arrays ONCE and both self-join sides read the same shuffle
    # output (ReusedExchange) — without it Catalyst inlines the n-gram
    # generation into both sides and recomputes it per pair
    t = (
        d.select("doc_id", "lang", "source", hashed.alias("ngrams"))
        .filter(F.size(toks) >= 3)
        .repartition("lang", "source")
    )
    a = t.select(
        F.col("doc_id").alias("a_doc"), "lang", "source",
        F.col("ngrams").alias("a_ngrams"),
    )
    b = t.select(
        F.col("doc_id").alias("b_doc"), "lang", "source",
        F.col("ngrams").alias("b_ngrams"),
    )
    inter = F.size(F.array_intersect("a_ngrams", "b_ngrams"))
    union = F.size("a_ngrams") + F.size("b_ngrams") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(b, ["lang", "source"])
        .filter(F.col("a_doc") < F.col("b_doc"))
        .withColumn("jac_raw", jac)
        .filter(F.col("jac_raw") >= 0.2)
        .select("a_doc", "b_doc", F.round("jac_raw", 4).alias("jac"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (rows-only oracle) — reuses the ER fingerprinter
# ---------------------------------------------------------------------------

def _doc_minhash(spark: SparkSession, sf_dir: str, cfg: ERConfig) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    mh = make_minhash_udf(cfg)
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return (
        d.filter(F.length(F.trim("text")) > 0)
        .withColumn("_fp", mh(norm))
        .select(
            "doc_id",
            F.col("_fp.minhash").alias("minhash"),
            F.col("_fp.bands").alias("bands"),
        )
    )


@register(
    "dd03_minhash_lsh_pairs",
    None,  # MinHash is not SQL-expressible — rows-only check
    survey_ref="S4/J4 MinHash-LSH blocking (north_star); deterministic seeds",
)
def dd_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = ERConfig(shingle_k=5, num_minhash=64, lsh_bands=16)
    fp = _doc_minhash(spark, sf_dir, cfg)
    keys = fp.select(
        "doc_id",
        F.explode(
            F.zip_with(
                "bands",
                F.array([F.lit(i) for i in range(cfg.lsh_bands)]),
                lambda h, i: F.concat(i.cast("string"), F.lit(":"), h.cast("string")),
            )
        ).alias("band_key"),
    )
    a = keys.select(F.col("doc_id").alias("a_doc"), "band_key")
    b = keys.select(F.col("doc_id").alias("b_doc"), "band_key")
    cand = (
        a.join(b, "band_key")
        .filter(F.col("a_doc") < F.col("b_doc"))
        .select("a_doc", "b_doc")
        .distinct()
    )
    from smaph_spark.operators.pairs import _minhash_agree_udf

    pa = fp.select(F.col("doc_id").alias("a_doc"), F.col("minhash").alias("a_mh"))
    pb = fp.select(F.col("doc_id").alias("b_doc"), F.col("minhash").alias("b_mh"))
    return (
        cand.join(pa, "a_doc")
        .join(pb, "b_doc")
        .withColumn("jaccard_est", _minhash_agree_udf("a_mh", "b_mh"))
        .filter(F.col("jaccard_est") >= 0.5)
        .select("a_doc", "b_doc", F.round("jaccard_est", 4).alias("jaccard_est"))
    )


# ---------------------------------------------------------------------------
# SimHash near-dup (rows-only oracle)
# ---------------------------------------------------------------------------

def _make_simhash_udf(seed: int = 0x51A0):
    """64-bit SimHash over whitespace tokens: sign-sum of token hashes,
    batch-vectorized numpy."""
    rng = np.random.default_rng(seed)
    mult = np.uint64(int(rng.integers(1, 1 << 62)) | 1)

    @F.pandas_udf(T.LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = (t or "").lower().split()
            if not toks:
                continue
            # deterministic token hash: FNV-1a, vectorized per batch row
            hs = np.fromiter(
                (_fnv1a(tok) for tok in toks), dtype=np.uint64, count=len(toks)
            ) * mult
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            sums = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits(
                (sums > 0).astype(np.uint8), bitorder="little"
            ).view(np.uint64)[0]
        return pd.Series(out.view(np.int64))

    return simhash_udf


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


@register(
    "dd04_simhash_pairs",
    None,  # rows-only
    survey_ref="SimHash near-dup; banded hamming join (scale path: 4x16-bit chunks)",
)
def dd_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    sh = _make_simhash_udf()
    sig = d.select("doc_id", sh("text").alias("sim"))
    # band on 4 x 16-bit chunks: pairs agreeing on >= 1 chunk are candidates
    chunks = sig.select(
        "doc_id", "sim",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{c}:"),
                        F.shiftrightunsigned("sim", 16 * c).bitwiseAND(F.lit(0xFFFF)).cast("string"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("chunk_key"),
    )
    a = chunks.select(F.col("doc_id").alias("a_doc"), F.col("sim").alias("a_sim"), "chunk_key")
    b = chunks.select(F.col("doc_id").alias("b_doc"), F.col("sim").alias("b_sim"), "chunk_key")
    ham = F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim")))
    return (
        a.join(b, "chunk_key")
        .filter(F.col("a_doc") < F.col("b_doc"))
        .select("a_doc", "b_doc", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= 6)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup — broadcast-tile GEMM, exact SQL oracle
# ---------------------------------------------------------------------------

_COS_SQL_EXPR = """
  list_dot_product(a.emb, b.emb) /
  (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))
"""

_DD05_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
    SELECT a.vec_id AS a_vec, b.vec_id AS b_vec,
           ROUND({_COS_SQL_EXPR}, 4) AS cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_COS_SQL_EXPR} >= 0.4
"""


def cosine_self_join(
    e: DataFrame, threshold: float, id_col: str = "vec_id", emb_col: str = "emb"
) -> DataFrame:
    """All-pairs cosine >= threshold via broadcast-tile + numpy GEMM.

    The comparison side is broadcast as a dense float64 matrix and each
    Arrow batch of the probe side does one matrix multiply (BLAS) —
    ~100x faster than per-pair array expressions. At 100 TB scale the
    broadcast side is processed in tiles (loop over `tile` slices of
    the collected side); testdata fits one tile. Distributed probe side
    streams through mapInPandas, so only one side is ever materialized.
    """
    spark = e.sparkSession
    rows = e.select(id_col, emb_col).collect()  # broadcast-dim side
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[emb_col] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    bc = spark.sparkContext.broadcast((ids, unit))

    def op(batches):
        b_ids, b_unit = bc.value
        for pdf in batches:
            q = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            qn = np.sqrt((q * q).sum(axis=1))
            qn[qn == 0] = 1.0
            sims = (q / qn[:, None]) @ b_unit.T  # (batch, n) GEMM
            q_ids = pdf[id_col].to_numpy().astype(np.int64)
            keep = (sims >= threshold) & (q_ids[:, None] < b_ids[None, :])
            qi, bi = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "a_vec": q_ids[qi],
                    "b_vec": b_ids[bi],
                    "cos_raw": sims[qi, bi],
                }
            )

    return e.select(id_col, emb_col).mapInPandas(
        op, schema="a_vec long, b_vec long, cos_raw double"
    )


@register(
    "dd05_embedding_dup_pairs",
    _DD05_SQL,
    survey_ref="embedding cosine near-dup (J5 relatedness-pair analogue)",
)
def dd_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    return cosine_self_join(e, threshold=0.4).select(
        "a_vec", "b_vec", F.round("cos_raw", 4).alias("cos")
    )
