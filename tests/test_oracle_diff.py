"""Oracle-differential test over every registered query (the same check
the driver runs at sf0.01 — SURVEY.md §5 item 1)."""

from __future__ import annotations

import pytest

from bigdata1_spark import registry
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("key", sorted(registry.ORACLES))
def test_query_matches_oracle(key, spark, duck, sf_dir):
    df = registry.QUERIES[key](spark, sf_dir)
    assert_matches_oracle(df, duck, registry.ORACLES[key], key=key)
    # operators that cache intermediates must not leak storage memory
    # across the ~80-query sweep
    spark.catalog.clearCache()


@pytest.mark.parametrize("key", sorted(set(registry.QUERIES) - set(registry.ORACLES)))
def test_rows_only_queries_run(key, spark, sf_dir):
    """Queries without a SQL oracle still must run and return rows."""
    df = registry.QUERIES[key](spark, sf_dir)
    assert df.count() >= 0
    spark.catalog.clearCache()
