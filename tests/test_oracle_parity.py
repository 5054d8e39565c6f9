"""Driver-contract parity: every oracle-paired query must match DuckDB
exactly (row count + schema + order-insensitive values) at sf0.001 —
the same comparison the driver runs at sf0.01."""

import os

import pytest

import __spark_entry__ as entry_mod
from smaph_spark.plans.parity import check_query
from smaph_spark.plans.star_queries import QUERIES

SF_DIR = os.environ.get("SMAPH_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.sql is not None)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if s.sql is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    spec = QUERIES[name]
    res = check_query(spark, SF_DIR, name, spec.fn, spec.sql)
    assert res["ok"], res


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_contract_shape():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30
    assert all(callable(f) for f in q.values())


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_oracle_paired_queries_inside_driver_window():
    """Round-3 VERDICT item 1/9: the driver's correctness harness only
    records the first 50 queries in queries() order — every
    oracle-paired query must sit inside that window (rows-only queries,
    pytest-pinned, absorb the cutoff)."""
    q_names = list(entry_mod.queries())
    oracle = set(entry_mod.oracle_sql())
    window = entry_mod._DRIVER_WINDOW
    outside = [n for n in q_names[window:] if n in oracle]
    assert outside == [], (
        f"oracle-paired queries past the driver's {window}-row window: "
        f"{outside}"
    )
    # the window itself must not silently shrink below the paired count
    assert len(oracle) <= window
    # and queries()/oracle_sql() agree on the pairing
    assert oracle == {n for n, s in QUERIES.items() if s.sql is not None}
