"""Total-order determinism guard for every ordered-LIMIT key.

Round 9's sf1 sweep proved the failure mode is real: `limit_n` ordered
by (l_orderkey, l_linenumber) — not a total order on this data (1.18M
duplicate pairs at sf1) — and the LIMIT-100 boundary cut a tie group
differently in Spark vs DuckDB, flipping the value hash while rows and
schema stayed green. The contract every top-k/LIMIT key must honor:
the result MULTISET is independent of physical execution. That holds
iff the ORDER BY is a total order, or every remaining tie group is
projection-identical (any boundary choice yields the same multiset).

This suite enforces the contract mechanically instead of by docstring:
every registry key whose oracle SQL contains LIMIT is re-run under
perturbed physical configs (different shuffle-partition counts change
the merge order inside TakeOrderedAndProject, which is exactly where a
non-total order picks different boundary rows) and the normalized
result multisets must be identical. A new top-k key gets this guard
for free the moment its oracle says LIMIT — no opt-in to forget.
"""

from __future__ import annotations

import re

import pytest

from bigdata1_spark import registry
from tests.oracle import _normalize

# Physical perturbations: coprime partition counts well away from the
# session default (32), so partial top-k merge trees differ in both
# shape and row routing.
_PARTITION_PERTURBATIONS = (5, 17)


def _ordered_limit_keys() -> list[str]:
    return sorted(
        k
        for k, sql in registry.ORACLES.items()
        if re.search(r"\bLIMIT\b", sql, re.IGNORECASE)
    )


def test_enumeration_sees_known_limit_keys():
    """The regex enumeration must cover the keys we know carry LIMIT —
    if the oracle registry is refactored and this goes dark, the whole
    guard silently guards nothing."""
    keys = _ordered_limit_keys()
    for expected in ("limit_n", "tpch_q2", "tpch_q3", "tpch_q18", "sim_topk"):
        assert expected in keys, f"{expected} missing from LIMIT enumeration"
    assert len(keys) >= 15, keys


@pytest.mark.parametrize("key", _ordered_limit_keys())
def test_ordered_limit_result_is_partition_invariant(spark, sf_dir, key):
    """Re-run each ordered-LIMIT key under perturbed shuffle-partition
    counts: a non-total ORDER BY with non-identical tied rows at the
    LIMIT boundary can (and does — limit_n at sf1) return different
    multisets; a total order, or projection-identical ties, cannot."""
    default = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for parts in _PARTITION_PERTURBATIONS:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            df = registry.QUERIES[key](spark, sf_dir).toPandas()
            results.append(_normalize(df))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert results[0] == results[1], (
        f"[{key}] ordered-LIMIT result changed under a physical "
        f"perturbation (shuffle.partitions {_PARTITION_PERTURBATIONS}) — "
        "the ORDER BY is not a total order on this data and ties at the "
        "LIMIT boundary are not projection-identical; extend the sort "
        "key (Spark AND oracle side) until the boundary is stable"
    )
