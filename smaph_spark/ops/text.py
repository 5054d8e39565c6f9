"""Text-analysis operators over the `documents` table.

Language-ID (stopword-overlap heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and a winnowing rolling-hash
document fingerprint. All hot paths JVM-side; only the fingerprint
needs an Arrow UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smaph_spark.plans.star_queries import load, register

# BPE-ish pre-tokenizer: word pieces OR single non-space symbols
_BPE_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


@register(
    "tx01_token_stats",
    rf"""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
           length(text) AS n_chars_actual,
           length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
             AS n_non_alnum
    FROM documents
    """,
    survey_ref="X4 tokenize (SmaphUtils.java:369-385) + X12 non-alnum count (:510-516)",
)
def tx_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws_tokens = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    return d.select(
        "doc_id",
        ws_tokens.alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0)).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
        ).alias("n_non_alnum"),
    )


@register(
    "tx02_quality_scores",
    r"""
    WITH t AS (
      SELECT doc_id, text, length(text) AS n,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
      FROM documents)
    SELECT doc_id,
           ROUND(CASE WHEN n = 0 THEN 0.0
                 ELSE (length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE / n)
                 END, 4) AS punct_ratio,
           ROUND(CASE WHEN n_tok = 0 THEN 0.0
                 ELSE length(text)::DOUBLE / n_tok END, 4) AS avg_token_len,
           CASE WHEN n_tok BETWEEN 10 AND 100000 AND n >= 50 THEN TRUE
                ELSE FALSE END AS keep
    FROM t
    """,
    survey_ref="quality scoring (length/punct ratios); F4 accept/reject shape",
)
def tx_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n = F.length("text")
    n_tok = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    return d.select(
        "doc_id",
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n), 4
        ).alias("punct_ratio"),
        F.round(
            F.when(n_tok == 0, F.lit(0.0)).otherwise(n.cast("double") / n_tok), 4
        ).alias("avg_token_len"),
        (n_tok.between(10, 100000) & (n >= 50)).alias("keep"),
    )


# stopword profiles for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "und", "das", "ein", "zu", "ist"],
    "es": ["el", "la", "los", "y", "de", "que", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
    "zh": ["de", "shi", "le", "zai", "he", "you", "wo"],
}


def _langid_sql() -> str:
    selects = []
    for lang, words in sorted(_STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in words)
        selects.append(
            f"SELECT doc_id, '{lang}' AS cand_lang, "
            f"len(list_filter(toks, x -> list_contains([{lst}], x))) AS hits "
            f"FROM t"
        )
    union = " UNION ALL ".join(selects)
    return rf"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
      FROM documents),
    scores AS ({union})
    SELECT doc_id, cand_lang AS predicted_lang, hits FROM (
      SELECT doc_id, cand_lang, hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, cand_lang) AS rn
      FROM scores) WHERE rn = 1
    """


@register(
    "tx03_langid",
    _langid_sql(),
    survey_ref="language-ID heuristic (stopword overlap, argmax per doc — W4 shape)",
)
def tx_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    toks = F.when(
        F.length(F.trim("text")) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.lower(F.trim("text")), r"\s+"))
    t = d.select("doc_id", toks.alias("toks"))
    parts = []
    for lang, words in sorted(_STOPWORDS.items()):
        wordlist = F.array(*[F.lit(w) for w in words])
        hits = F.size(
            F.filter("toks", lambda x: F.array_contains(wordlist, x))
        )
        parts.append(
            t.select(
                "doc_id", F.lit(lang).alias("cand_lang"), hits.alias("hits")
            )
        )
    scores = parts[0]
    for p in parts[1:]:
        scores = scores.unionByName(p)
    w = W.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("cand_lang"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("doc_id", F.col("cand_lang").alias("predicted_lang"), "hits")
    )


# ---------------------------------------------------------------------------
# winnowing fingerprint (rolling hash + local-min selection) — Arrow UDF
# ---------------------------------------------------------------------------

def make_fingerprint_udf(k: int = 8, window: int = 4, seed: int = 0xF1E5):
    """Winnowing (Schleimer et al., SIGMOD'03 public algorithm):
    k-gram rolling hashes, per-window minimum selection; returns the
    sorted distinct selected hashes as the document fingerprint."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fingerprint(texts: pd.Series) -> pd.Series:
        out = []
        B = np.uint64(1099511628211)
        for t in texts:
            t = (t or "").lower()
            data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            n = data.shape[0]
            if n < k:
                out.append([])
                continue
            m = n - k + 1
            h = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                h = h * B + data[j : j + m]
            if m <= window:
                sel = np.array([h.min()], dtype=np.uint64)
            else:
                from numpy.lib.stride_tricks import sliding_window_view

                sel = sliding_window_view(h, window).min(axis=1)
            out.append(sorted(set(int(x) for x in sel.view(np.int64))))
        return pd.Series(out)

    return fingerprint


@register(
    "tx04_fingerprints",
    None,  # rolling-hash winnowing — rows-only check
    survey_ref="document fingerprinting (winnowing; S9 cache-key analogue)",
)
def tx_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    fp = make_fingerprint_udf()
    return d.select(
        "doc_id",
        F.size(fp("text")).alias("n_fingerprints"),
    )
