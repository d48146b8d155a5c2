"""Invariant tests for the flagship basket queries (FIXTURES.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata1_spark.operators import basket


def test_top5_group_invariants(spark, sf_dir):
    top = basket.top5_per_month(spark, sf_dir).cache()
    per_month = top.groupBy("month").agg(
        F.count(F.lit(1)).alias("k"),
        F.min("cnt").alias("min_cnt"),
        F.max("cnt").alias("max_cnt"),
    )
    bad = per_month.filter("k > 5").count()
    assert bad == 0
    # counts non-increasing with rank
    pairs = (
        top.alias("a")
        .join(top.alias("b"),
              (F.col("a.month") == F.col("b.month"))
              & (F.col("a.rn") + 1 == F.col("b.rn")))
        .filter(F.col("a.cnt") < F.col("b.cnt"))
    )
    assert pairs.count() == 0
    top.unpersist()


def test_revenue_partition_completeness(spark, sf_dir):
    """sum of per-month revenue == total revenue per item."""
    rev = basket.revenue_per_item_month(spark, sf_dir)
    per_item = rev.groupBy("item").agg(
        F.sum(F.col("revenue").cast("decimal(18,4)")).alias("total")
    )
    li = basket.load_table(spark, sf_dir, "lineitem")
    direct = li.groupBy(F.col("l_partkey").alias("item")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("direct")
    )
    joined = per_item.join(direct, "item", "full")
    mismatched = joined.filter(
        (F.col("total").isNull()) | (F.col("direct").isNull())
        | (F.col("total") != F.col("direct"))
    )
    assert mismatched.count() == 0


def test_assoc_rule_invariants(spark, sf_dir):
    rules = basket.assoc_rules(spark, sf_dir).cache()
    # 0 < support <= confidence <= 1
    bad = rules.filter(
        ~((F.col("support") > 0)
          & (F.col("support") <= F.col("confidence"))
          & (F.col("confidence") <= 1))
    ).count()
    assert bad == 0
    # support symmetry: support(a→b) == support(b→a)
    sym = (
        rules.alias("x")
        .join(rules.alias("y"),
              (F.col("x.antecedent") == F.col("y.consequent"))
              & (F.col("x.consequent") == F.col("y.antecedent")))
        .filter(F.col("x.support") != F.col("y.support"))
    )
    assert sym.count() == 0
    # no self-rules (quirk Q7 — Spark reference behavior)
    assert rules.filter("antecedent = consequent").count() == 0
    rules.unpersist()
