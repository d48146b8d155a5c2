"""Entity-matching operators: blocked fuzzy (edit-distance) joins.

No reference analog (the reference joins only on exact keys); this is
the record-linkage surface a switching user needs for dirty-dimension
reconciliation — match names/addresses/titles that differ by typos.

The design is the canonical blocked comparison: candidate pairs are
generated ONLY within a blocking key (here p_brand), never corpus ×
corpus, and a cheap length-band prefilter runs before the edit-distance
kernel. At 100 TB the blocking key is what bounds the quadratic term:
pair count is Σ_b |block_b|², so skewed blocks get a secondary blocking
pass (name prefix / sorted-neighborhood), exactly like the LSH
hot-bucket chunking in dedup.py — the mechanism here is the single-key
version of that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata1_spark.sources.tables import load_table


def fuzzy_join(
    spark: SparkSession, sf_dir: str, max_dist: int = 2
) -> DataFrame:
    """Within-brand fuzzy self-match on part names: all pairs whose
    Levenshtein distance is ≤ ``max_dist``.

    One shuffle on the blocking key (p_brand); the length-band
    prefilter ``|len(a) − len(b)| ≤ max_dist`` is implied by the
    distance bound (deleting/inserting beyond it cannot be repaired in
    ≤ max_dist edits), so it is a pure pruning step the oracle safely
    omits — it cuts the edit-distance evaluations without touching the
    result. ``p_partkey < p_partkey`` gives each unordered pair once.
    Columns: a_key, b_key, a_name, b_name, dist.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_name"
    )
    a = p.alias("a")
    b = p.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey"))
        & (
            F.abs(F.length("a.p_name") - F.length("b.p_name"))
            <= F.lit(max_dist)
        ),
    )
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        pairs.select(
            F.col("a.p_partkey").alias("a_key"),
            F.col("b.p_partkey").alias("b_key"),
            F.col("a.p_name").alias("a_name"),
            F.col("b.p_name").alias("b_name"),
            dist.cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )
