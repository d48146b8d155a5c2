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


def hyperplane_planes(
    n_planes: int, dim: int, seed: int
) -> list[list[float]]:
    """Seeded pseudo-random hyperplanes as plain Python floats.

    Exposed so oracle-SQL generators can embed the *same* literals and
    compute the identical bucket key engine-side (the key is then a
    deterministic, cross-engine-reproducible function of the vector).
    """
    import random

    rng = random.Random(seed)
    return [
        [rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def hyperplane_sign_key(
    v: Column, n_planes: int, dim: int, seed: int
) -> Column:
    """LSH bucket key: sign pattern of dot products with the seeded
    hyperplanes (random-hyperplane LSH, Charikar). Plane components are
    shipped as plain literals — an inline-hash formulation burned ~2 s
    of analyzer time on 256 constant-foldable xxhash64 nodes per query.
    Sign bits are invariant under vector scaling, so the key can be
    computed on raw (unnormalized) vectors.
    """
    key = F.lit(0).cast("long")
    for plane in hyperplane_planes(n_planes, dim, seed):
        bit = F.when(
            dot(v, F.array(*[F.lit(c) for c in plane])) >= 0, F.lit(1)
        ).otherwise(F.lit(0))
        key = key * 2 + bit
    return key
