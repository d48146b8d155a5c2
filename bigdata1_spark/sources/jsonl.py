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
            # multiLine: quoted fields may legally contain newlines; a
            # line-splitting read would silently mis-parse them if the
            # generator ever emits one (today's documents have none,
            # but the round-trip must not depend on that invariant)
            .option("multiLine", "true")
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


def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → XML sink → XML source → per-language rollup.

    Spark 4 bundles the (formerly spark-xml) native XML source, the
    format enterprise feeds still arrive in. One ``<doc>`` element per
    row under the default root; the writer escapes text content
    (&amp;/&lt;/newlines all round-trip — pinned by the distinct-md5
    count, exactly like the CSV quote/escape path), and the explicit
    read schema skips the inference pass. Read parallelism at scale:
    one row element per record split, same sharding story as JSONL.
    Same rollup as ``scan_jsonl``. Columns: lang, n_docs, total_chars,
    n_texts.
    """
    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="bigdata1_xml_")
    try:
        path = os.path.join(work, "docs_xml")
        (
            docs.write.mode("overwrite")
            .format("xml")
            .option("rowTag", "doc")
            .save(path)
        )
        back = (
            spark.read.schema(docs.schema)
            .format("xml")
            .option("rowTag", "doc")
            .load(path)
        )
        res = back.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct(F.md5("text")).alias("n_texts"),
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → ORC sink → ORC source → per-language rollup.

    ORC is the remaining bundled columnar format (avro ships as a
    separate package and is deliberately out of scope); the round-trip
    proves the full predicate-pushdown-capable binary path next to the
    text formats. Same rollup and content-pinning (distinct-md5) as
    ``scan_jsonl``. Columns: lang, n_docs, total_chars, n_texts.
    """
    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="bigdata1_orc_")
    try:
        path = os.path.join(work, "docs_orc")
        docs.write.mode("overwrite").orc(path)
        back = spark.read.schema(docs.schema).orc(path)
        res = back.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct(F.md5("text")).alias("n_texts"),
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def scan_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write + partition-PRUNED read: documents
    written ``partitionBy(lang)``, then one partition read back through
    a partition-column filter.

    The assert is structural, not just value-level: the read's file
    index must report exactly one selected partition (partition
    pruning happened at planning time — at 100 TB this is the
    difference between listing one prefix and scanning the corpus).
    The rollup aggregates source/doc stats for the pruned language.
    Columns: source, n_docs, total_chars.
    """
    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="bigdata1_part_")
    try:
        path = os.path.join(work, "docs_part")
        docs.write.mode("overwrite").partitionBy("lang").parquet(path)
        # An empty source writes no partition directories at all, so the
        # read-back cannot infer a schema — surface that as an empty
        # result with the output contract's schema (the same fallback
        # the streaming bounded drains use for empty sources).
        try:
            back = spark.read.parquet(path).filter(F.col("lang") == "fr")
        except Exception:
            return spark.createDataFrame(
                [], "source string, n_docs bigint, total_chars bigint"
            )
        # Structural pruning check: the scan node must carry the lang
        # predicate as a PARTITION filter (planning-time pruning), not
        # a post-scan data filter.
        plan = back._jdf.queryExecution().executedPlan().toString()
        # explicit raise (not bare assert): survives python -O, so the
        # structural scale guard cannot be silently stripped
        if not ("PartitionFilters" in plan and "fr" in plan):
            raise AssertionError(
                f"partition pruning missing from scan:\n{plan}"
            )
        res = back.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet generations of the documents
    table — v1 without ``n_chars``, v2 with it — unified by
    ``mergeSchema`` so old files surface the new column as NULL (the
    additive-column evolution every long-lived table goes through).

    The generation split is content-deterministic (doc_id parity), so
    the oracle can emulate it exactly; the rollup counts how many rows
    per language carry the evolved column. At 100 TB, mergeSchema's
    footer-union runs over file metadata only — the data itself is
    never rewritten, which is the entire point of additive evolution.
    Columns: lang, n_docs, n_with_chars, evolved_chars.
    """
    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="bigdata1_evolve_")
    try:
        path = os.path.join(work, "docs")
        docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "lang", "source", "text"
        ).write.parquet(os.path.join(path, "gen=1"))
        docs.filter(F.col("doc_id") % 2 == 1).write.parquet(
            os.path.join(path, "gen=2")
        )
        back = spark.read.option("mergeSchema", "true").parquet(path)
        res = back.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("n_chars").alias("n_with_chars"),
            F.sum("n_chars").cast("long").alias("evolved_chars"),
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# two live campaign months + a decoy the dim filter removes: DPP only
# fires when the dim side carries a filter (otherwise the join would
# keep every partition and pruning has no benefit)
DPP_MONTHS = (
    ("1995-03", "spring95"),
    ("1995-04", "spring95b"),
    ("1996-01", "retired96"),
)


def dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: a month-partitioned fact joined to a
    small campaign dimension prunes its partitions AT RUNTIME from the
    dim's values — the optimizer surface that decides whether a
    100 TB star join reads two prefixes or the whole table (static
    pruning can't help: the surviving months are join results, not
    literals the planner sees).

    Orders are written ``partitionBy(month)``; the 2-row dim joins on
    the partition column. Spark reuses the dim's broadcast as an IN
    subquery filter inside the fact scan's PartitionFilters — the
    function asserts the ``dynamicpruning`` expression structurally,
    so a regression to a full scan fails the oracle run, not just a
    benchmark. Columns: month, campaign, n_orders, total_price.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    )
    dim = spark.createDataFrame(
        list(DPP_MONTHS), ["month", "campaign"]
    ).filter(F.col("campaign").startswith("spring"))
    work = tempfile.mkdtemp(prefix="bigdata1_dpp_")
    try:
        path = os.path.join(work, "orders_part")
        # cluster by the partition column before the partitioned write:
        # without it every one of the shuffle's map tasks opens a file
        # in every month directory (tasks × months tiny files — the
        # guide §6 small-files trap, ~2.5k files at sf0.1); repartition
        # makes each month's rows land in one task → one file per
        # month, and the downstream DPP-pruned read opens 2 files
        # instead of ~64
        orders.repartition("month").write.mode("overwrite").partitionBy(
            "month"
        ).parquet(path)
        try:
            fact = spark.read.parquet(path)
        except Exception:  # empty source wrote no partition dirs
            return spark.createDataFrame(
                [],
                "month string, campaign string, n_orders bigint, "
                "total_price double",
            )
        joined = fact.join(F.broadcast(dim), "month")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # explicit raise (not bare assert): survives python -O
        if "dynamicpruning" not in plan:
            raise AssertionError(
                f"dynamic partition pruning missing from fact scan:\n{plan}"
            )
        res = joined.groupBy("month", "campaign").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("price"), 2).cast("double").alias("total_price"),
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
