"""Text-analysis operators over ``documents`` (north-star X4):
corpus stats, token counting, quality scoring, language-ID,
document fingerprinting.

All built-in column expressions except the rolling-hash fingerprint
(Arrow-batched pandas UDF — genuinely sequential per document, the
documented Python-UDF exception). Ratios are single IEEE divisions of
exact integers so oracle hashes match.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from bigdata1_spark.functions.hashing import let
from bigdata1_spark.functions.textfns import LANG_MARKERS, STOPWORDS, tokens
from bigdata1_spark.sources.tables import load_table


def _toks(col: str = "text") -> Column:
    return tokens(F.col(col))


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus distribution per (lang, source): doc count, char sums,
    token sums, exact-double averages."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "source", "n_chars", F.size(_toks()).alias("n_tokens")
    )
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.sum("n_chars").cast("double")
         / F.count(F.lit(1)).cast("double")).alias("avg_chars"),
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counts: whitespace tokens and a BPE-ish regex
    sub-token count (alpha runs / digit runs / single punctuation —
    the pre-tokenizer split most BPE vocabularies assume)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_toks()).cast("long").alias("ws_tokens"),
        F.regexp_count(
            F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
        ).cast("long").alias("bpe_tokens"),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals per doc: length, mean token length,
    stopword ratio, and a composite score.

    score = stop_ratio * 0.5 + min(n_tokens/100, 1) * 0.5 — the usual
    shape of cheap pretraining-data filters (enough function words,
    enough length). All ratios are single divisions of exact ints.
    """
    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])

    def from_feats(f: Column) -> Column:
        n_tok = f.getField("n_tokens").cast("double")
        n_stop = f.getField("n_stop").cast("double")
        stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
        mean_tok_len = F.when(
            n_tok > 0, f.getField("char_sum").cast("double") / n_tok
        ).otherwise(F.lit(0.0))
        return F.struct(
            f.getField("n_tokens").alias("n_tokens"),
            mean_tok_len.alias("mean_token_len"),
            stop_ratio.alias("stop_ratio"),
            (stop_ratio * 0.5
             + F.least(n_tok / 100, F.lit(1.0)) * 0.5).alias("score"),
        )

    # Nested let-bindings: tokenize once, reduce to three integer
    # features once, then derive the ratio outputs — inlining would
    # re-tokenize per reference (5×) after projection collapse.
    row = let(
        _toks(),
        lambda t: let(
            F.struct(
                F.size(t).cast("long").alias("n_tokens"),
                F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
                .cast("long").alias("n_stop"),
                F.aggregate(
                    t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
                ).alias("char_sum"),
            ),
            from_feats,
        ),
    )
    return docs.select("doc_id", row.alias("r")).select(
        "doc_id", "r.n_tokens", "r.mean_token_len", "r.stop_ratio", "r.score"
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: count marker hits per language via a
    broadcast join against the inlined marker table, argmax with
    deterministic tie-break (hits desc, lang asc); no hits → 'und'.
    Columns: doc_id, pred_lang, hits.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(_toks()).alias("tok"))
    markers = spark.createDataFrame(
        [(lang, w) for lang, ws in LANG_MARKERS.items() for w in ws],
        ["m_lang", "m_word"],
    )
    hits = (
        tok.join(F.broadcast(markers), F.col("tok") == F.col("m_word"))
        .groupBy("doc_id", F.col("m_lang").alias("pred_lang"))
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    # argmax via min over (−hits, lang): smallest tuple = highest hits,
    # then lexicographically first lang — deterministic tie-break.
    best = (
        hits.groupBy("doc_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("hits")).alias("neg"),
                    F.col("pred_lang").alias("lang"),
                )
            ).alias("b")
        )
        .select(
            "doc_id",
            F.col("b.lang").alias("pred_lang"),
            (-F.col("b.neg")).cast("long").alias("hits"),
        )
    )
    return (
        docs.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("pred_lang"), F.lit("und")).alias("pred_lang"),
            F.coalesce(F.col("hits"), F.lit(0).cast("long")).alias("hits"),
        )
    )


def _rolling_hash_fn(texts: pd.Series) -> pd.Series:
    """Karp-Rabin rolling hash over characters, mod 2^61-1.

    Genuinely sequential per document — the documented pandas-UDF
    exception (Arrow-batched, vectorized transfer; the loop is per-doc,
    not per-row-per-interpreter-call).
    """
    MOD = (1 << 61) - 1
    BASE = 257

    def fp(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * BASE + ord(ch)) % MOD
        return h

    return texts.map(lambda s: fp(s) if s is not None else 0)


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc rolling-hash fingerprint (rows-only check: the hash loop
    isn't SQL-expressible). Columns: doc_id, fp.

    The pandas_udf is built lazily — decorating at import time would
    require an active SparkSession just to parse the return type.
    """
    rolling_hash = pandas_udf(_rolling_hash_fn, "long")
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_hash(F.col("text")).alias("fp"))


def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val/test split (~80/10/10).

    Splitting on a content hash (not random()) keeps assignment stable
    across runs, engines, and re-partitioning — the reproducibility
    property a training pipeline needs. The first two hex digits of
    md5(text) give 256 uniform buckets: <205 train, <230 val, else
    test. Columns: doc_id, bucket, split.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("text")), 1, 2), 16, 10).cast(
        "long"
    )
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 205, "train")
        .when(bucket < 230, "val")
        .otherwise("test")
        .alias("split"),
    )


def ngram_freq(spark: SparkSession, sf_dir: str, top_n: int = 50) -> DataFrame:
    """Corpus-level bigram frequencies, top-N with deterministic
    tie-break — vocabulary/phrase statistics over the documents table
    (explode → count → ordered limit; the count shuffle carries one row
    per distinct bigram thanks to map-side partial aggregation)."""
    from bigdata1_spark.functions.textfns import tokens, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        F.explode(word_shingles(tokens(F.col("text")), 2)).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("bigram"))
        .limit(top_n)
    )
