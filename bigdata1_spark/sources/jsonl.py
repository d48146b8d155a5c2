"""Self-describing text sources/sinks (JSONL + CSV) — JSONL is the
interchange format of LLM data pipelines (every public pretraining
corpus ships as JSONL shards); CSV is the lowest-common-denominator
export format a switching user brings along.

The reference reads only line-text and parquet (SURVEY.md §2.1 S1);
a complete engine also round-trips JSONL. The key proves the whole
path: write the documents table as JSONL (escaping newlines/unicode in
the payload), read it back with an explicit schema (never inference —
at 100 TB an inference pass is a full extra scan), and aggregate. The
distinct-md5 count pins content equality through the escape/unescape
round-trip, not just row counts.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata1_spark.sources.tables import load_table


def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → CSV sink → CSV source → per-language rollup.

    The built-in CSV source/sink pair (with header and quoting), as
    opposed to the reference's hand-split line format
    (``sources/billing.py`` / BD_hw1 ``src/spark/*.java`` textFile +
    split(",")): free-text payloads exercise the quote/escape path, the
    explicit read schema avoids the inference scan, and the distinct-md5
    count pins payload equality through quoting. Same shuffle shape as
    ``scan_jsonl``. Columns: lang, n_docs, total_chars, n_texts.
    """
    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="bigdata1_csv_")
    try:
        path = os.path.join(work, "docs_csv")
        docs.write.mode("overwrite").option("header", "true").csv(path)
        back = (
            spark.read.schema(docs.schema)
            .option("header", "true")
            .csv(path)
        )
        res = back.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct(F.md5("text")).alias("n_texts"),
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → JSONL sink → JSONL source → per-language rollup.

    Scale notes: the write and read are both parallel over shards (one
    JSONL object per task); the explicit read schema keeps it a single
    pass. The rollup shuffles once on ``lang``. Columns: lang, n_docs,
    total_chars, n_texts.
    """
    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="bigdata1_jsonl_")
    try:
        path = os.path.join(work, "docs_jsonl")
        docs.write.mode("overwrite").json(path)
        back = spark.read.schema(docs.schema).json(path)
        res = back.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct(F.md5("text")).alias("n_texts"),
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
