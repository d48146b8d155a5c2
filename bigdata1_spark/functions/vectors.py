"""Vector column expressions over ARRAY<FLOAT/DOUBLE> embeddings.

Dot products are sequential left folds (``F.aggregate``) over
double-cast arrays — deterministic evaluation order, bit-identical to
DuckDB's ``list_dot_product`` on ``DOUBLE[]`` (verified empirically),
which is what makes cosine scores oracle-hashable.

At 100 TB these expressions run inside codegen per-row with no shuffle;
for top-k see operators/similarity.py for the bucketed scale path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i as a sequential fold (order-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot/(|a|*|b|) — single IEEE division of two deterministic doubles."""
    return dot(a, b) / (norm(a) * norm(b))


def scaled(a: Column, divisor: Column) -> Column:
    """v / s elementwise. Pass a *materialized column reference* as the
    divisor (project the norm in a prior select) — inlining norm(a) here
    would re-evaluate the whole fold once per element."""
    return F.transform(a, lambda x: x / divisor)
