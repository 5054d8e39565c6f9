"""Stage 2 — blocking-key generation with hot-key capping + salting.

The reference harvests entity candidates from three search sources
(SmaphAnnotator.java:415-525) and unions them (QueryInformation.java:
33-44). Here the candidate sources become deterministic blocking-key
families over the normalized `files` rows:

* ``N:`` name family — (lang, basename-stem) equality, the analogue of
  SMAPH's S1/S2 "same surface form" sources;
* ``L:<band>`` LSH family — MinHash band keys over content shingles,
  the analogue of S3 (content-based snippets source).

Skew control (north_rule, and SURVEY §4 item 1): a popular path
("README.md") yields a quadratic block. Blocks larger than
``max_block_size`` are salted into ``block_salt_buckets`` sub-blocks
(bounded recall loss, counted and logged like the reference logs its
binding caps — DefaultBindingGenerator.java:135-136); blocks larger
than ``max_block_size * block_salt_buckets`` are dropped entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smaph_spark.config import ERConfig


def generate_blocks(normalized: DataFrame, cfg: ERConfig) -> DataFrame:
    """normalized -> blocks(block_key string, record_id long).

    One row per (record, key). Key families unioned and deduplicated
    (ref: candidate-set union J1, QueryInformation.allCandidates).
    """
    keys = []
    if cfg.use_name_blocking:
        keys.append(
            F.array(F.concat(F.lit("N:"), F.col("lang"), F.lit(":"), F.col("name")))
        )
    if cfg.use_lsh_blocking:
        # tag each band key with its band index so bands don't collide;
        # empty/null content gets NO LSH keys (all empty files would
        # otherwise share one sentinel minhash and form a single
        # quadratic block — exact dups are still caught by the name
        # family + sha shortcut)
        zipped = F.zip_with(
            F.col("bands"),
            F.array([F.lit(i) for i in range(cfg.lsh_bands)]),
            lambda h, i: F.concat(
                F.lit("L:"), i.cast("string"), F.lit(":"), h.cast("string")
            ),
        )
        keys.append(
            F.when(F.coalesce(F.col("n_chars"), F.lit(0)) > 0, zipped).otherwise(
                F.array().cast("array<string>")
            )
        )
    if not keys:
        raise ValueError("at least one blocking family must be enabled")
    all_keys = keys[0] if len(keys) == 1 else F.concat(*keys)
    # No dropDuplicates (round-6): the key families are disjoint by
    # construction — the name key is "N:"-prefixed and unique per
    # record, each LSH band key carries its band index ("L:<i>:") so
    # bands cannot collide — and pair generation dedups on
    # (left_id, right_id) downstream anyway (generate_pairs groupBy),
    # so the full shuffle of the exploded key table bought nothing
    # (~850k rows at the sf1.0 gate, one of stage 2's two exchanges).
    return normalized.select(
        F.col("record_id"), F.explode(all_keys).alias("block_key")
    )


def cap_and_salt_blocks(
    blocks: DataFrame, cfg: ERConfig
) -> tuple[DataFrame, DataFrame]:
    """Apply the frequency cap (F3 analogue) and salting.

    Returns (salted_blocks with column ``join_key``, block_metrics).
    block_metrics has one row per affected block: (block_key, n_records,
    action ∈ {salted, dropped}) — "no silent caps".
    """
    # ONE shuffle (round-6): the per-key count rides a window over the
    # key partitioning instead of a separate groupBy + self-join (two
    # key-table passes through the exchange). NULL keys are filtered
    # up front to preserve the old equi-join semantics exactly (a NULL
    # block key never matched the counts join, so its rows were
    # dropped; the window would have kept them as one NULL block).
    from pyspark.sql import Window as W

    blocks = blocks.filter(F.col("block_key").isNotNull())
    enriched = blocks.withColumn(
        "n_records", F.count("*").over(W.partitionBy("block_key"))
    )

    drop_limit = cfg.max_block_size * cfg.block_salt_buckets
    metrics = (
        enriched.filter(F.col("n_records") > cfg.max_block_size)
        .groupBy("block_key")
        .agg(F.max("n_records").alias("n_records"))
        .withColumn(
            "action",
            F.when(F.col("n_records") > drop_limit, F.lit("dropped")).otherwise(
                F.lit("salted")
            ),
        )
    )

    kept = enriched.filter(
        (F.col("n_records") > 1) & (F.col("n_records") <= drop_limit)
    )
    salted = kept.withColumn(
        "join_key",
        F.when(
            F.col("n_records") <= cfg.max_block_size, F.col("block_key")
        ).otherwise(
            F.concat(
                F.col("block_key"),
                F.lit("#"),
                F.pmod(F.xxhash64("record_id"), F.lit(cfg.block_salt_buckets)).cast(
                    "string"
                ),
            )
        ),
    ).select("join_key", "block_key", "record_id")
    return salted, metrics
