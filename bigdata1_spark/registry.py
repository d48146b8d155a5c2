"""Query registry: SURVEY.md §2 query key → (Spark impl, DuckDB oracle SQL).

Single source of truth consumed by ``__spark_entry__.py`` (driver
contract), ``bench.py``, and the test suite's oracle-differential tests.

Every entry's Spark DataFrame and oracle SQL must agree on column NAMES
and (order-insensitive) VALUES; the driver sorts columns by name and
hashes values. Keep aliases synchronized on both sides.

Determinism rules used throughout so hashes match bit-for-bit:
* double sums go through DECIMAL(18,4) then cast back (order-independent);
* ratios divide exact integer counts in double (one IEEE op, identical in
  both engines);
* every ranking has a total-order tie-break;
* timestamps are projected to strings/dates (engines agree under UTC).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdata1_spark.operators import basket

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(key: str, fn: QueryFn, oracle: str | None = None) -> None:
    if key in QUERIES:
        raise KeyError(f"duplicate query key {key!r}")
    QUERIES[key] = fn
    if oracle is not None:
        ORACLES[key] = oracle


# ---------------------------------------------------------------------------
# Flagship basket queries (reference parity — SURVEY.md §2.3/2.4/2.6)
# ---------------------------------------------------------------------------

register(
    "topk_window",
    basket.top5_per_month,
    """
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), counts AS (
      SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
             b.l_partkey AS item, COUNT(*) AS cnt
      FROM baskets b JOIN orders o ON b.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    )
    SELECT month, item, cnt, rn FROM (
      SELECT month, item, cnt,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY month ORDER BY cnt DESC, item ASC) AS BIGINT) AS rn
      FROM counts
    ) WHERE rn <= 5
    """,
)

register(
    "groupby_sum",
    basket.revenue_per_item_month,
    """
    SELECT l.l_partkey AS item,
           strftime(o.o_orderdate, '%Y-%m') AS month,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
)

register(
    "itemset_freq",
    basket.itemset_frequencies,
    """
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), members AS (
      SELECT CAST(l_partkey AS VARCHAR) AS itemset,
             CAST(1 AS BIGINT) AS n_items
      FROM baskets
      UNION ALL
      SELECT CAST(a.l_partkey AS VARCHAR) || ',' ||
             CAST(b.l_partkey AS VARCHAR) AS itemset,
             CAST(2 AS BIGINT) AS n_items
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT itemset, n_items, COUNT(*) AS freq
    FROM members GROUP BY 1, 2
    """,
)

register(
    "assoc_rules",
    basket.assoc_rules,
    """
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), total AS (
      SELECT COUNT(DISTINCT l_orderkey) AS total_baskets FROM baskets
    ), item_counts AS (
      SELECT l_partkey AS item, COUNT(*) AS item_cnt FROM baskets GROUP BY 1
    ), pairs AS (
      SELECT a.l_partkey AS i1, b.l_partkey AS i2, COUNT(*) AS pair_cnt
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), directed AS (
      SELECT i1 AS antecedent, i2 AS consequent, pair_cnt FROM pairs
      UNION ALL
      SELECT i2 AS antecedent, i1 AS consequent, pair_cnt FROM pairs
    )
    SELECT d.antecedent, d.consequent, d.pair_cnt,
           CAST(d.pair_cnt AS DOUBLE) / CAST(t.total_baskets AS DOUBLE)
             AS support,
           CAST(d.pair_cnt AS DOUBLE) / CAST(ic.item_cnt AS DOUBLE)
             AS confidence
    FROM directed d
    JOIN item_counts ic ON d.antecedent = ic.item
    CROSS JOIN total t
    """,
)
