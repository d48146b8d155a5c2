"""Parquet table readers for the driver testdata star schema.

Canonical ingest path (SURVEY.md §2.1 S1): the reference scans schemaless
text lines (``sc.textFile``); our engine's canonical storage is parquet so
scans get columnar vectorized reads, predicate pushdown, and column pruning
for free. The billing text format is still supported via
:mod:`bigdata1_spark.sources.billing`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_DIMS = ("region", "nation", "supplier", "part")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; parquet scan → pushdown/pruning apply."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; one of {TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark rejects
        # unless nanos surface as long. Set at runtime (it is a dynamic
        # SQL conf) so the engine also works under a vanilla session the
        # driver harness creates, not just our own get_spark().
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (see session conf): integer-divide
        # to micros (a double division would lose precision past 2^53)
        # and rebuild a real timestamp column.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
