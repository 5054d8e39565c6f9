"""ab01 — abbreviation-expansion gate query (S9 closure, offline mode).

The Stands4 HTTP service is environment-out-of-scope; this query runs
the reference's OFFLINE path (warm-cache dictionary lookup,
Stands4AbbreviationExpansion.setCache:119-143) with a corpus-derived
acronym dictionary standing in for the cache file: every part name
contributes its first-letter acronym, and each part is then expanded
through the broadcast dictionary — exercising exactly the
clean -> dictionary-join -> expand/membership operator family of
AbbreviationExpansion.java:1-20.

Registered rows-only (the 50-slot driver window is full — see the
rotation policy in __spark_entry__.py); the DuckDB twin below is
pinned by tests/test_abbrev.py::test_ab01_duckdb_parity via the SAME
check_query comparison the driver runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smaph_spark.functions.abbreviations import (
    build_acronym_dictionary, expand_abbreviations,
)
from smaph_spark.plans.star_queries import load, register

#: DuckDB twin (pytest-pinned): NOTE DuckDB regexp_replace needs the
#: 'g' flag (Spark's is global by default), and [^0-9A-Za-z_] is the
#: Java-default \W both engines agree on
AB01_SQL = r"""
    WITH t AS (
      SELECT p_partkey, p_name,
             lower(regexp_replace(
               array_to_string(
                 list_transform(string_split_regex(trim(p_name), '\s+'),
                                x -> x[1]), ''),
               '[^0-9A-Za-z_]', '', 'g')) AS abbrev
      FROM part WHERE length(trim(p_name)) > 0),
    d AS (
      SELECT abbrev, list_sort(list(DISTINCT p_name)) AS expansions
      FROM t WHERE length(abbrev) > 0 GROUP BY abbrev)
    SELECT t.p_partkey, t.abbrev,
           COALESCE(len(d.expansions), 0) AS n_expansions,
           COALESCE(list_contains(d.expansions, t.p_name), FALSE)
             AS is_self_expansion
    FROM t LEFT JOIN d USING (abbrev)
"""


@register(
    "ab01_abbrev_expansion",
    None,  # rows-only at the driver (window full); the DuckDB twin
    # AB01_SQL is pytest-pinned with the driver's own comparison
    survey_ref="abbreviation expansion, offline dictionary mode "
               "(AbbreviationExpansion.java:1-20; Stands4 warm-cache "
               "path :119-143; clean :157-159) — broadcast-dict "
               "expand + membership",
)
def ab_abbrev_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smaph_spark.functions.abbreviations import acronym_of

    p = load(spark, sf_dir, "part").filter(
        F.length(F.trim("p_name")) > 0
    ).select("p_partkey", "p_name")
    dictionary = build_acronym_dictionary(p, "p_name")
    expanded = expand_abbreviations(
        p.withColumn("abbrev", acronym_of(F.col("p_name"))),
        "abbrev", dictionary,
    )
    # explicit NULL branch: size(NULL) is -1 under legacy sizeOfNull,
    # so coalesce alone would mis-count missing dictionary entries
    return expanded.select(
        "p_partkey", "abbrev",
        F.when(F.col("expansions").isNull(), F.lit(0))
        .otherwise(F.size("expansions")).alias("n_expansions"),
        F.coalesce(
            F.array_contains("expansions", F.col("p_name")), F.lit(False)
        ).alias("is_self_expansion"),
    )
