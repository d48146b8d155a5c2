"""Data-layout operators: multi-dimensional clustering (Z-order).

Z-ordering is the data-layout half of pruning at 100 TB: sorting files
by the interleaved bits of several filter columns makes EVERY one of
those columns range-clustered, so parquet min/max statistics prune
files for predicates on any of them (Delta OPTIMIZE ZORDER / Iceberg
sort orders do exactly this). The encode is a pure bit-interleave —
whole-stage-codegen arithmetic, no Python, no shuffle; the clustering
itself is one ``repartitionByRange`` on the z-value, which is also the
only shuffle a full rewrite needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata1_spark.sources.tables import load_table

ZORDER_BITS = 6  # 6 bits per dimension → 12-bit z-values, 4096 cells


def _interleave(x: Column, y: Column, bits: int) -> Column:
    """z = … y₂x₂y₁x₁y₀x₀ — x in even bit positions, y in odd."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order encode of (p_size, p_retailprice) into a single
    clustering key, then range-repartition on it — the layout pass a
    table rewrite would run before writing files.

    Both dimensions are quantized to 6-bit cells (size is already
    ≤ 64; price divides its observed range into 64 equal-width cells
    from fixed literal bounds, so the mapping is stable under any
    partitioning and identical in the oracle). The range partitioning
    does not change row values — the returned rows prove the encode,
    the plan carries the clustering exchange.
    Columns: p_partkey, cell_x, cell_y, zval.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    n_cells = 1 << ZORDER_BITS
    # Fixed quantization bounds (generator emits sizes 1-50, prices
    # ~1-2000): literals, not a statistics pass, so the cell of a row
    # never depends on what other rows are present.
    x = F.least(
        F.greatest(F.col("p_size").cast("long"), F.lit(0)),
        F.lit(n_cells - 1),
    )
    y = F.least(
        F.greatest(
            F.floor(F.col("p_retailprice") / 32.0).cast("long"), F.lit(0)
        ),
        F.lit(n_cells - 1),
    )
    encoded = p.select(
        "p_partkey",
        x.alias("cell_x"),
        y.alias("cell_y"),
        _interleave(x, y, ZORDER_BITS).alias("zval"),
    )
    return encoded.repartitionByRange(8, "zval")
