"""Plan-shape assertions (SURVEY.md §5 item 4): the physical properties
that keep queries viable at 100 TB, checked at test scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata1_spark.operators import basket, micro
from bigdata1_spark.plans import checks


def test_topk_window_plan(spark, sf_dir):
    df = basket.top5_per_month(spark, sf_dir)
    checks.assert_window_group_limit(df, "topk_window")
    checks.assert_max_exchanges(df, 3, "topk_window")


def test_scan_pushdown(spark, sf_dir):
    df = micro.scan_parquet(spark, sf_dir)
    checks.assert_pushed_filter(df, "GreaterThanOrEqual(l_quantity", "scan")
    checks.assert_read_schema_only(
        df, {"l_orderkey", "l_partkey", "l_quantity"}, "scan"
    )


def test_broadcast_dim_join(spark, sf_dir):
    df = micro.join_broadcast(spark, sf_dir)
    checks.assert_broadcast_join(df, "join_broadcast")
    checks.assert_max_exchanges(df, 1, "join_broadcast")


def test_assoc_rules_shuffle_budget(spark, sf_dir):
    """Reference S&C uses 2 shuffles + a driver round-trip; our plan may
    use a few more stages (distinct, basket grouping, pair counting) but
    must stay bounded and keep the antecedent join broadcast."""
    df = basket.assoc_rules(spark, sf_dir)
    checks.assert_broadcast_join(df, "assoc_rules")
    checks.assert_max_exchanges(df, 5, "assoc_rules")


def test_revenue_column_pruning(spark, sf_dir):
    df = basket.revenue_per_item_month(spark, sf_dir)
    checks.assert_read_schema_only(
        df,
        {"l_orderkey", "l_partkey", "l_extendedprice",
         "o_orderkey", "o_orderdate"},
        "groupby_sum",
    )


def test_asof_join_single_shuffle(spark, sf_dir):
    """The as-of join's union-merge formulation must shuffle exactly
    once (on user_id) — a range self-join shape would blow up at scale."""
    from bigdata1_spark.operators import temporal

    df = temporal.asof_join(spark, sf_dir)
    checks.assert_max_exchanges(df, 1, "asof_join")


def test_range_join_broadcasts_dim(spark, sf_dir):
    from bigdata1_spark.operators import temporal

    df = temporal.join_range(spark, sf_dir)
    checks.assert_broadcast_join(df, "join_range")
