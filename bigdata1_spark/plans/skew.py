"""Skew mitigation helpers — the 100 TB posture for hot keys.

Two complementary mechanisms:

* **AQE skew handling** (on by default in :mod:`bigdata1_spark.session`):
  splits oversized shuffle partitions at runtime for joins
  (``spark.sql.adaptive.skewJoin.enabled``).
* **Salting** (this module): for aggregations over power-law keys, AQE
  cannot split a single hot GROUP BY key across tasks — pre-splitting
  with a salt can. ``salted_agg`` runs the classic two-stage plan:
  partial aggregate on (key, salt), final aggregate on key. Both
  shuffles carry pre-aggregated rows, so the hot key's raw rows never
  converge on one task.

The same technique applies to joins (replicate the small side per salt);
broadcast joins (our default for dims) sidestep join skew entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column name -> (partial_agg_expr, merge_fn)
    where the partial expression runs per (keys, salt) and merge_fn is
    a CALLABLE receiving the partial's column and returning the
    combining aggregate per keys — e.g. a count is
    ``(F.count(F.lit(1)), lambda c: F.sum(c).cast("long"))``, a sum is
    ``(F.sum(c), lambda c: F.sum(c))``, a max is
    ``(F.max(c), lambda c: F.max(c))``. A callable is required because
    the partial lives under an internal mangled name the merge side
    cannot reference any other way.

    The salt is a deterministic spread (xxhash64 of an arbitrary wide
    column set modulo n_salts would also work; monotonically_increasing_id
    keeps it cheap and uniform within partitions).
    """
    for name, (_p, m) in aggs.items():
        if not callable(m):
            raise TypeError(
                f"salted_agg merge for {name!r} must be a callable "
                "taking the partial column (e.g. lambda c: F.sum(c))"
            )
    salted = df.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[p.alias(f"__p_{name}") for name, (p, _m) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            m(F.col(f"__p_{name}")).alias(name)
            for name, (_p, m) in aggs.items()
        ]
    )


def salted_count(df: DataFrame, keys: Sequence[str], n_salts: int = 16) -> DataFrame:
    """Skew-safe ``groupBy(keys).count()`` (column name ``n``)."""
    return salted_agg(
        df,
        keys,
        {"n": (F.count(F.lit(1)), lambda c: F.sum(c).cast("long"))},
        n_salts=n_salts,
    )
