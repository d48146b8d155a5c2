"""Time-series operators over the ``events`` table: as-of join, range
(band) join, sessionization support.

The reference has no temporal operators (its dates are string surgery,
SURVEY.md §1.2); these are engine-completeness additions a time-series
user expects. Scale posture: the as-of join is the union-merge + window
formulation (ONE shuffle on the entity key, no range self-join — the
standard way to make as-of joins survive 100 TB); the band join
broadcasts a literal dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata1_spark.sources.tables import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click event, the latest purchase of the same user at or
    before the click (ASOF LEFT JOIN).

    Union-merge formulation: tag purchases 0 / clicks 1, sort each user
    by (ts, tag, value), and carry the last non-null purchase forward
    with ``last(ignorenulls)``. ONE hash shuffle on user_id; the sort
    and the carry-forward stay inside that partition — no range
    self-join, no per-row probe, skew bounded by events-per-user.
    Equal-timestamp purchase ties resolve to the max value: value is the
    sort tie-breaker, so the last purchase row at a timestamp is the
    max-value one (matches the oracle's per-(user, ts) MAX collapse).
    Columns: event_id, user_id, click_ts, purchase_ts, purchase_value.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("value").alias("pvalue"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(1).alias("tag"), "event_id",
        F.lit(None).cast("double").alias("pvalue"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "pvalue")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = purchases.unionByName(clicks).select(
        "user_id", "ts", "tag", "event_id",
        F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True)
        .over(w).alias("purchase_ts"),
        F.last(F.when(F.col("tag") == 0, F.col("pvalue")), ignorenulls=True)
        .over(w).alias("purchase_value"),
    )
    # no-prior-purchase clicks keep LEFT-join semantics via explicit
    # sentinels ('' / -1.0) — NULL-free output hashes identically under
    # any NaN treatment in the driver's comparator.
    return merged.filter(F.col("tag") == 1).select(
        "event_id", "user_id",
        F.date_format("ts", TS_FMT).alias("click_ts"),
        F.coalesce(F.date_format("purchase_ts", TS_FMT), F.lit(""))
        .alias("purchase_ts"),
        F.coalesce(F.col("purchase_value"), F.lit(-1.0))
        .alias("purchase_value"),
    )


def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join: events bucketed into value bands via a broadcast
    range-predicate join against a literal 5-row dimension.

    The dim side is constant-size, so this plans as a broadcast
    nested-loop with a cheap band predicate — the scale-safe shape for
    banded/range dimension joins (never a shuffle of the fact side).
    Columns: band, n_events, total_value.
    """
    bands = spark.createDataFrame(
        [(i, float(i * 100), float((i + 1) * 100)) for i in range(5)],
        ["band", "lo", "hi"],
    )
    ev = load_table(spark, sf_dir, "events").select("value")
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double").alias("total_value"),
        )
    )


SCD2_OPEN_SENTINEL = "9999-12-31 00:00:00.000000"


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: collapse each user's event stream into
    validity intervals — one row per RUN of consecutive equal
    event_type, with valid_from/valid_to half-open interval bounds.
    This is the slowly-changing-dimension-type-2 table a warehouse
    derives from a change feed (and the change-detection flavor of
    gaps-and-islands; ``sessionize`` is the time-gap flavor).

    Plan: one shuffle on user_id feeds ALL THREE window passes (change
    flag via lag, island id via running sum, valid_to via lead over
    islands' aggregate) — Spark reuses the exchange because every
    window partitions by the same key; the island aggregation groups
    on (user_id, island) which the same partitioning co-locates. The
    open interval carries a far-future sentinel rather than NULL (NULL
    → NaN asymmetry breaks driver hash parity).
    Columns: user_id, event_type, valid_from, valid_to, n_events.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    worder = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(worder).isNull()
            | (F.lag("event_type").over(worder) != F.col("event_type")),
            1,
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("chg").over(
            worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = flagged.groupBy("user_id", "island").agg(
        F.min("event_type").alias("event_type"),  # constant within a run
        F.min("ts").alias("from_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wlead = Window.partitionBy("user_id").orderBy("island")
    return runs.select(
        "user_id",
        "event_type",
        F.date_format("from_ts", TS_FMT).alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("from_ts").over(wlead), TS_FMT),
            F.lit(SCD2_OPEN_SENTINEL),
        ).alias("valid_to"),
        "n_events",
    )
