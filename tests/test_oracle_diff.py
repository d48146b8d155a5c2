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


def test_dtype_parity_catches_hugeint_float():
    """The round-2 tpch_q12 escape: DuckDB HUGEINT → pandas float64 vs
    Spark int64 passes Python == but fails the driver's value hash. The
    parity check must flag it even though the values compare equal."""
    import pandas as pd

    from tests.oracle import _assert_dtype_parity

    spark_side = pd.DataFrame({"k": ["F"], "high_line_count": [1791]})
    duck_side = pd.DataFrame({"k": ["F"], "high_line_count": [1791.0]})
    with pytest.raises(AssertionError, match="dtype kind mismatch"):
        _assert_dtype_parity(spark_side, duck_side, "q12-regression")
    # same-kind columns (float-float, int-int, object) must not trip it
    _assert_dtype_parity(duck_side, duck_side.copy(), "ok")


def test_every_query_has_an_oracle():
    """The rows-only set went empty in round 7 and must STAY empty —
    a key registered without a DuckDB oracle regresses the correctness
    gate to a weaker rows-only check, and that regression should fail
    loudly here rather than slip through as an extra skipped test
    (VERDICT r07 'what's wrong' item 2)."""
    missing = sorted(set(registry.QUERIES) - set(registry.ORACLES))
    assert missing == [], f"registry keys without a DuckDB oracle: {missing}"
