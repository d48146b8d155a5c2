"""Classic TPC-H-style analytics queries (Q1/Q3/Q5/Q6 shapes) over the
driver testdata star schema.

The reference workload is market-basket only; a user switching a real
analytics deployment expects the canonical scan-agg / join-topk /
multi-join-rollup shapes too, so they are registered first-class. Dates
are adapted to the testdata's 1995–2001 span; money math follows the
registry's DECIMAL(18,4) exact-sum rule so oracle hashes match.

Scale notes: Q1/Q6 are single-scan partial aggregations (no join);
Q3/Q5 join through broadcast dims where Catalyst can prove smallness,
sort-merge otherwise, with AQE re-planning at runtime — nothing here
needs a hint at 100 TB beyond what the session config already sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata1_spark.operators.basket import exact_sum
from bigdata1_spark.sources.tables import load_table


def _dec(c: str | F.Column) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,4)")


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: per (returnflag, linestatus) quantity/price
    sums, discounted + taxed revenue, averages, row count."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    # price*(1-d)*(1+t) as price * (1 - d + t - d*t): the 2-factor form
    # keeps the product within decimal(38) so NEITHER engine loses scale
    # (a 3-factor chain overflows precision and rounds differently).
    d8 = F.col("l_discount").cast("decimal(8,4)")
    t8 = F.col("l_tax").cast("decimal(8,4)")
    mult = F.lit(1).cast("decimal(8,4)") - d8 + t8 - (d8 * t8)
    charge = _dec("l_extendedprice") * mult
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity"), "sum_qty"),
            exact_sum(F.col("l_extendedprice"), "sum_base_price"),
            # exact wide-decimal sums, rounded to cents IN DECIMAL before
            # the double cast: a >17-significant-digit decimal converts
            # to double differently across engines (Spark rounds the big
            # decimal once; DuckDB divides int128 by 10^scale — two
            # roundings). At ≤15 digits the cast is exact everywhere.
            F.round(F.sum(disc_price), 2).cast("double")
            .alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / n.cast("double"))
            .alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / n.cast("double"))
            .alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / n.cast("double"))
            .alias("avg_disc"),
            n.alias("count_order"),
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping-priority: top-10 unshipped BUILDING orders by
    discounted revenue (join + agg + deterministic top-k)."""
    cutoff = "1998-03-15"
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("date")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff)
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking shape: date-range scan + EXISTS
    semi-join + count per priority. The testdata lineitem has no
    commit/receipt dates, so the EXISTS predicate is adapted to
    'has a returned line' (l_returnflag = 'R') — the plan shape (range
    filter, left-semi, group-count, ordered output) is what the query
    exercises: the semi-join never multiplies order rows no matter how
    many lines match."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))
    ).select("o_orderkey", "o_orderpriority")
    flagged = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(
            flagged, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: revenue per nation for one region/year
    where customer and supplier share the nation (5-way join)."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast revenue change: single-scan filtered aggregate —
    every predicate must reach the parquet reader."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipmode-priority shape: fact-dim join + conditional CASE
    aggregation (the two-bucket pivot every report query uses). The
    testdata has no l_shipmode, so lines group by l_linestatus and the
    CASE buckets split urgent (priority 1/2) vs other orders — the
    exercised pattern is SUM(CASE WHEN …) pairs over one join, one
    shuffle."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.split(F.col("o_orderpriority"), "-").getItem(0).alias("prio"),
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    ).select("l_orderkey", "l_linestatus")
    # CASE-parity: a NULL priority must land in the ELSE bucket like the
    # SQL CASE, not vanish from F.sum (isin().cast() yields NULL for NULL).
    urgent = (
        F.when(F.col("prio").isin("1", "2"), F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(urgent).alias("high_line_count"),
            F.sum(F.lit(1) - urgent).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )
