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

# Keys with at least one green driver CORRECTNESS row across rounds
# 1-14 (union of CORRECTNESS_r01..r14.json — regenerated r15 per the
# r14 VERDICT task 5; the set had been frozen at round 6, so the 32
# keys added since never made the front of the driver's ~50-key
# sample). queries() emits re-verify-first keys FIRST (latest driver
# row is red or the implementation/oracle changed since it was
# banked), then keys with no driver row yet, then old greens.
_DRIVER_CHECKED = frozenset({
    "agg_distinct", "agg_stats", "anomaly_zscore", "approx_sketch",
    "array_ops", "arrow_map", "asof_join", "asof_join_forward",
    "assoc_rules", "bfs_hops", "billing_total_b", "bm25_search",
    "bpe_merge_round", "bpe_merge_round2", "bpe_pair_counts",
    "bucketed_join", "burst_hours", "cdc_apply", "centroid_per_label",
    "cogrouped_map", "collect_list_agg", "column_profile",
    "concurrency", "contamination_ngrams", "cooccur_pmi", "corr_matrix",
    "cumulative_distinct", "cusum_changepoint", "decontaminate_apply",
    "dedup_apply", "dedup_chunks", "dedup_clusters", "dedup_embedding",
    "dedup_embedding_multiprobe", "dedup_exact", "dedup_jaccard",
    "dedup_near", "dedup_near_apply", "dedup_semantic",
    "dedup_semantic_apply", "dedup_simhash", "doc_chunking",
    "doc_entropy", "domain_cap", "dpp_join", "dq_expectations",
    "dsir_sample", "embedding_norms", "event_transitions",
    "events_attribution_streamed", "events_dedup_streamed",
    "events_enrich_streamed", "events_leftjoin_streamed",
    "events_salted_agg_streamed", "events_salted_join_streamed",
    "events_session_streamed", "events_sliding",
    "events_sliding_streamed", "events_stateful_sessions_streamed",
    "events_upsert_streamed", "events_user_counts_streamed",
    "events_window", "events_window_streamed", "ewma", "explode_items",
    "filter_predicate", "fingerprint", "funnel_conversion",
    "fuzzy_join", "gen_billings", "global_count", "global_enumerate",
    "graph_degree", "groupby_count", "groupby_cube",
    "groupby_grouping_sets", "groupby_median_mode", "groupby_quantiles",
    "groupby_rollup", "groupby_sum", "grouped_map_normalize",
    "heavy_hitters", "histogram", "holt_winters",
    "inter_event_gap_stats", "interval_coverage",
    "interval_overlap_join", "iso_week_rollup", "itemset_freq",
    "ivm_delta_agg", "join_anti", "join_broadcast", "join_cross",
    "join_outer", "join_range", "join_self_pairs", "join_semi",
    "k_anonymity", "kcore", "knn_classify", "knn_join", "label_prop",
    "lang_id", "limit_n", "locf_fill", "mann_whitney", "map_ops",
    "mixture_sample", "multimodal_join", "multimodal_pipeline",
    "mutual_info", "naive_bayes_lang", "ngram_freq", "ntile_stats",
    "observed_metrics", "ohlc_bars", "pagerank", "pagerank_iter1",
    "pandas_grouped_agg", "pii_scrub", "pipeline_pretraining",
    "pivot_agg", "posexplode_items", "pq_encode", "project_cast",
    "project_month", "project_split", "psi_drift", "python_datasink",
    "python_datasource", "python_stream_source", "quality_filters",
    "quality_score", "repetition_metrics", "resample_interpolate",
    "retention_cohorts", "rollup_multires", "rrf_fusion",
    "runtime_filter_join", "sample_exact_k", "sample_split",
    "sample_stratified", "sample_weighted", "scalar_concat",
    "scalar_datetime", "scalar_json", "scalar_round", "scalar_string",
    "scalar_url", "scalar_variant", "scan_csv", "scan_jsonl",
    "scan_orc", "scan_parquet", "scan_partitioned", "scan_xml",
    "scd2_intervals", "schema_evolution", "seasonal_naive",
    "session_window_fn", "sessionize", "setop_except",
    "setop_except_all", "setop_intersect", "setop_intersect_all",
    "setop_union", "shard_pack", "sim_topk", "sim_topk_ivf",
    "sim_topk_ivf_multiprobe", "sim_topk_ivf_pq", "sim_topk_lsh",
    "sketch_merge_rollup", "skew_salted_agg", "skew_salted_join",
    "skyline", "sort_asc", "sort_desc", "spearman_corr", "sql_api",
    "sql_catalog", "sql_lateral", "sql_recursive", "substring_dedup",
    "table_diff", "text_normalize", "text_stats", "tfidf_topterms",
    "token_count", "topk_window", "tpch_q1", "tpch_q10", "tpch_q11",
    "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16",
    "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q2", "tpch_q20",
    "tpch_q21", "tpch_q22", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q9", "transpose_stats",
    "triangle_count", "twa", "tz_hour_rollup", "udtf_analyze",
    "udtf_tokens", "unigram_logprob", "unpivot_metrics", "upsert_apply",
    "user_paths", "vocab_encode", "window_first_last", "window_lag",
    "window_range_frame", "window_rank", "window_running_sum",
    "winnow_fingerprint", "zorder_cluster",
})

# Re-verify BEFORE everything else: the implementation or oracle
# changed after the last driver row was banked. Round 15 changed all
# five: link_prediction moved to the bounded mutual-top-K graph
# contract (new oracle), fuzzy_join to the FUZZY_MAX_REPS bounded-
# output contract (new columns + oracle), triangle_count /
# clustering_coefficient to the tiled dense bitmap kernel (plan-only,
# but the dispatch cutoff moved 16384 → 65536), and moments_profile's
# x² to DECIMAL (ADVICE r14).
_REVERIFY_FIRST = (
    "link_prediction",
    "fuzzy_join",
    "triangle_count",
    "clustering_coefficient",
    "moments_profile",
)


def _priority_order() -> list[str]:
    keys = list(registry.QUERIES)
    first = [k for k in _REVERIFY_FIRST if k in keys]
    never = [k for k in keys
             if k not in _DRIVER_CHECKED and k not in _REVERIFY_FIRST]
    rest = [k for k in keys
            if k in _DRIVER_CHECKED and k not in _REVERIFY_FIRST]
    return first + never + rest


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
