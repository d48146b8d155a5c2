"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in :mod:`bigdata1_spark`; this module only adapts
the registry to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata1_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Keys that already earned a driver CORRECTNESS row in round 1. The r1 run
# recorded exactly the first 50 registered keys and stopped, so the registry
# tail (including all four TPC-H queries) never got a row. queries() emits
# not-yet-checked keys FIRST so a capped driver run covers them this round;
# every key keeps its entry either way.
_R1_CHECKED = frozenset({
    "topk_window", "groupby_sum", "itemset_freq", "assoc_rules",
    "join_self_pairs", "scan_parquet", "project_split", "project_month",
    "project_cast", "filter_predicate", "explode_items", "array_ops",
    "scalar_round", "scalar_concat", "groupby_count", "global_count",
    "collect_list_agg", "sort_desc", "sort_asc", "limit_n",
    "join_broadcast", "setop_union", "setop_intersect", "setop_except",
    # dedup_embedding is deliberately absent: its blocking key changed
    # from the label stand-in to the LSH bucket this round, so it must
    # earn a fresh driver row.
    "gen_billings", "dedup_exact", "dedup_jaccard", "dedup_near",
    "dedup_simhash", "sim_topk", "sim_topk_lsh",
    "multimodal_join", "multimodal_pipeline", "text_stats", "token_count",
    "quality_score", "lang_id", "fingerprint", "join_semi", "join_anti",
    "join_outer", "window_running_sum", "window_lag", "agg_distinct",
    "groupby_rollup", "events_window", "pivot_agg", "groupby_cube",
    "sessionize",
})


def _priority_order() -> list[str]:
    keys = list(registry.QUERIES)
    return [k for k in keys if k not in _R1_CHECKED] + [
        k for k in keys if k in _R1_CHECKED
    ]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (top-5 items per month) on sf0.001."""
    return registry.QUERIES["topk_window"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: registry.QUERIES[k] for k in _priority_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query key (same column names)."""
    return {
        k: registry.ORACLES[k]
        for k in _priority_order()
        if k in registry.ORACLES
    }
