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
from pyspark.sql import functions as F

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


# events.ts has arrived from the driver in different physical encodings
# across testdata generations: TIMESTAMP(NANOS) (which Spark surfaces as
# bigint nanos under the nanosAsLong conf), plain int64 epoch values,
# micros TIMESTAMP_NTZ (parquet timestamp[us], isAdjustedToUTC=false),
# and tz-aware TIMESTAMP. All consumers expect a session-TZ TIMESTAMP.
# Epoch-integer granularity is decided by magnitude, not assumption:
# 1e17 cleanly separates micros (< 1e17 until year 5138) from nanos
# (>= 1e17 from 1973 on) for any plausible event time.
_EPOCH_NANOS_THRESHOLD = 100_000_000_000_000_000


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to TIMESTAMP whatever the source encoding.

    The single choke point for the events table's timestamp type —
    shared by the batch reader (:func:`load_table`) and the streaming
    reader (``streaming.events._read_events_stream``) so the two paths
    can never diverge again. ``tests/test_streaming.py`` pins the
    decoded values to the 2023–2025 range so a future encoding change
    fails loudly instead of producing 1970-epoch garbage.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        # Epoch integer: nanos vs micros decided per-value by magnitude
        # (integer div — a double division would lose precision past
        # 2^53; timestamp_micros keeps the arithmetic exact).
        micros = F.when(
            F.abs(F.col("ts")) >= F.lit(_EPOCH_NANOS_THRESHOLD),
            F.expr("ts div 1000"),
        ).otherwise(F.col("ts"))
        return df.withColumn("ts", F.timestamp_micros(micros))
    if dtype == "timestamp_ntz":
        # Wall-clock micros: reinterpret in the session TZ (UTC per
        # session.py, matching the DuckDB oracle's naive timestamps).
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; parquet scan → pushdown/pruning apply."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; one of {TABLES}")
    if name == "events":
        # Older testdata stores TIMESTAMP(NANOS), which Spark rejects
        # unless nanos surface as long. Set at runtime (it is a dynamic
        # SQL conf) so the engine also works under a vanilla session the
        # driver harness creates, not just our own get_spark(). Harmless
        # for micros-encoded files.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df
