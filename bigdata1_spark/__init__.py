"""bigdata1_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the reference
market-basket analytics workload (monthly top-k products, per-item monthly
revenue, pairwise association rules) as idiomatic Spark 3.x/4.x DataFrame
pipelines, and extends them with LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) designed for
100 TB-scale execution.

Layout:
    session.py    — SparkSession factory (AQE on, UTC, tuned shuffle conf)
    sources/      — testdata table readers, billing-line parser, generator
    operators/    — query implementations (basket, micro, dedup, text, ...)
    functions/    — reusable column expressions (arrays, hashing, text)
    plans/        — physical-plan assertions (shuffle count, broadcast)
    streaming/    — Structured Streaming demos over the events table
"""

__version__ = "0.1.0"
