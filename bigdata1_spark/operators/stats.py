"""Statistical-profiling operators: Pearson correlation matrix over the
fact table's measures, and mutual-information / chi-square association
between two categorical document columns.

No reference analog; this is the feature-statistics layer a training-data
pipeline runs to pick mixture weights and spot leaky/redundant columns
(e.g. "is quality_score just length in disguise?").

Numeric discipline (registry header rules): every sufficient statistic is
an EXACT integer — the measures are fixed-point at ≤2 decimals, so each
value is scaled to an integer with one ``round(x*100)`` (no ties: inputs
sit within 1e-9 of the grid), and all sums/products accumulate in
DECIMAL/HUGEINT with zero rounding. Only the final statistic per output
row is a single fixed-order IEEE chain on those exact integers, then
floor-rounded at 1e-6 — so the DuckDB oracles pin values bit-for-bit.
Pearson r is invariant under the affine scaling, so the scaled-integer
computation yields exactly the correlation of the original columns.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata1_spark.sources.tables import load_table

# (output name, source column, fixed-point scale). Scale 100 turns the
# 2-decimal TPC-H measures into exact integers; quantity is integral.
CORR_COLS = (
    ("quantity", "l_quantity", 1),
    ("price", "l_extendedprice", 100),
    ("discount", "l_discount", 100),
    ("tax", "l_tax", 100),
)


def _round6(col: F.Column) -> F.Column:
    """The repo-wide float pin: floor(x*1e6 + 0.5)/1e6 (round-half-up
    toward +inf, identical in Spark and DuckDB)."""
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the four lineitem measures in ONE
    aggregate pass (no per-pair rescans, no ML-lib driver collect).

    Rows are listwise-complete (all four measures non-NULL) so every
    pair shares the same n — the contract a downstream covariance
    consumer expects. The single scan computes 4 sums + 10 product sums
    + a count with map-side combine; the 6 upper-triangle pairs are then
    stacked from that ONE 1-row frame, so the plan is one shuffle of 15
    numbers regardless of table size (100 TB posture: nothing here
    grows with rows).

    Each sum is exact: values → scaled BIGINT (one unambiguous round),
    products in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), then

        r = (n·Sxy − Sx·Sy) / sqrt((n·Sxx − Sx²) · (n·Syy − Sy²))

    evaluated once in double (identical op order in the oracle) and
    floor-rounded at 1e-6. Zero-variance columns yield NULL rather than
    an engine-dependent inf/NaN. Columns: col_x, col_y, n_rows, corr.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cols = [
        F.round(F.col(src) * F.lit(scale)).cast("long").alias(name)
        for name, src, scale in CORR_COLS
    ]
    complete = li.select(*cols).na.drop("any")

    aggs = [F.count(F.lit(1)).alias("n")]
    names = [name for name, _, _ in CORR_COLS]
    for name in names:
        aggs.append(
            F.sum(F.col(name).cast("decimal(38,0)")).alias(f"s_{name}")
        )
    for a, b in combinations(names, 2):
        aggs.append(
            F.sum(
                F.col(a).cast("decimal(19,0)") * F.col(b).cast("decimal(19,0)")
            ).alias(f"s_{a}_{b}")
        )
    for name in names:
        aggs.append(
            F.sum(
                F.col(name).cast("decimal(19,0)")
                * F.col(name).cast("decimal(19,0)")
            ).alias(f"s_{name}_{name}")
        )
    stats = complete.agg(*aggs)

    pair_rows = []
    for a, b in combinations(names, 2):
        n = F.col("n").cast("double")
        sx = F.col(f"s_{a}").cast("double")
        sy = F.col(f"s_{b}").cast("double")
        sxy = F.col(f"s_{a}_{b}").cast("double")
        sxx = F.col(f"s_{a}_{a}").cast("double")
        syy = F.col(f"s_{b}_{b}").cast("double")
        num = n * sxy - sx * sy
        den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        pair_rows.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("n").alias("n_rows"),
                F.when(den > 0, _round6(num / den)).alias("corr"),
            )
        )
    return stats.select(
        F.explode(F.array(*pair_rows)).alias("p")
    ).select("p.col_x", "p.col_y", "p.n_rows", "p.corr")


def _contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lang × source contingency cells of ``documents`` with marginals.

    ONE scan + ONE groupBy shuffle; the marginals (n_lang, n_source,
    n_total) come from windows over the aggregated cell table (≤
    |langs|·|sources| rows — tiny at any corpus size), NOT from
    rescanning documents (the dsir_sample multi-consumer-lineage
    lesson). NULL categories group like any other value in both
    engines, so the NULL-twin sweep exercises them as real cells.
    """
    docs = load_table(spark, sf_dir, "documents").select("lang", "source")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_xy")
    )
    return (
        cells.withColumn(
            "n_lang", F.sum("n_xy").over(Window.partitionBy("lang"))
        )
        .withColumn(
            "n_source", F.sum("n_xy").over(Window.partitionBy("source"))
        )
        .withColumn(
            "n_total",
            F.sum("n_xy").over(Window.partitionBy()),
        )
    )


def mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell mutual-information terms between documents.lang and
    documents.source: ``(n_xy/N) · ln(n_xy·N / (n_x·n_y))``.

    Emitted per cell (the consumer sums ≤ |langs|·|sources| rows) so a
    final reduction's fold order never enters the contract — the
    psi_drift convention. Counts are exact integers from one scan; each
    term is one fixed-order IEEE chain, floor-rounded 1e-6. Cells only
    exist where n_xy ≥ 1, so the log argument is always positive.
    Columns: lang, source, n_xy, n_lang, n_source, n_total, mi_term.
    """
    cells = _contingency(spark, sf_dir)
    n_xy = F.col("n_xy").cast("double")
    n_x = F.col("n_lang").cast("double")
    n_y = F.col("n_source").cast("double")
    n = F.col("n_total").cast("double")
    term = (n_xy / n) * F.log((n_xy * n) / (n_x * n_y))
    return cells.select(
        "lang",
        "source",
        "n_xy",
        "n_lang",
        "n_source",
        "n_total",
        _round6(term).alias("mi_term"),
    )


def chi_square_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell chi-square association terms for the same lang × source
    contingency table: ``(obs − exp)² / exp`` with
    ``exp = n_x·n_y / N``.

    Same shape and discipline as :func:`mutual_info` (one scan, exact
    counts, one fixed-order float chain per row, per-cell emission).
    exp > 0 whenever a cell exists, so the division is always defined.
    Columns: lang, source, n_xy, expected, chi2_term.
    """
    cells = _contingency(spark, sf_dir)
    n_xy = F.col("n_xy").cast("double")
    exp = (
        F.col("n_lang").cast("double")
        * F.col("n_source").cast("double")
        / F.col("n_total").cast("double")
    )
    diff = n_xy - exp
    return cells.select(
        "lang",
        "source",
        "n_xy",
        _round6(exp).alias("expected"),
        _round6(diff * diff / exp).alias("chi2_term"),
    )


# Spearman uses the three small-domain measures (quantity 1..50,
# discount/tax at 2 decimals ~11/9 values): their joint contingency
# table is constant-bounded (< 5,000 cells) at ANY table size, so rank
# statistics never need a global row sort.
SPEARMAN_COLS = (
    ("quantity", "l_quantity", 1),
    ("discount", "l_discount", 100),
    ("tax", "l_tax", 100),
)


def spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Spearman rank correlation of three lineitem measures
    WITHOUT ranking any row: rows collapse into ONE joint contingency
    table (one scan + one groupBy of < 5,000 cells at any scale), and
    every rank statistic is derived from the cells.

    With ties, Spearman is Pearson over average ranks; the average
    rank of value v is ``cum_before(v) + (freq(v)+1)/2`` — a function
    of the marginal frequency table alone. To stay integer-exact the
    code uses DOUBLED ranks ``dr(v) = 2*cum(v) − freq(v) + 1`` (an
    affine map, under which Pearson r is invariant). Each marginal
    rank map is a window over its ≤51-value marginal (single-partition
    is fine: the partition is constant-bounded, not data-bounded) and
    is broadcast back onto the cells; the 3 pairwise sufficient
    statistics then fold in one aggregate over the cells with exact
    DECIMAL sums (freq·dr·dr ≤ 4n³ < 10³⁸ far beyond sf100).

    Rows are listwise-complete across the three measures (the
    corr_matrix contract). The only float math is the final Pearson
    chain per pair, identical op order in the oracle, floor-rounded
    1e-6; zero-variance marginals yield NULL. Columns: col_x, col_y,
    n_rows, rho.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cols = [
        F.round(F.col(src) * F.lit(scale)).cast("long").alias(name)
        for name, src, scale in SPEARMAN_COLS
    ]
    names = [name for name, _, _ in SPEARMAN_COLS]
    # cells fans out into 3 marginal derivations + the rank join —
    # without a cache the scan+groupBy would re-run per consumer (the
    # dsir_sample multi-consumer-lineage lesson). Constant-bounded
    # rows, so the cache is always tiny.
    cells = (
        li.select(*cols)
        .na.drop("any")
        .groupBy(*names)
        .agg(F.count(F.lit(1)).alias("f"))
        .cache()
    )
    ranked = cells
    for name in names:
        marg = cells.groupBy(name).agg(F.sum("f").alias("mf"))
        w = Window.orderBy(name).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        dr_map = marg.select(
            name,
            (
                F.lit(2) * F.sum("mf").over(w) - F.col("mf") + F.lit(1)
            ).alias(f"dr_{name}"),
        )
        ranked = ranked.join(F.broadcast(dr_map), name)

    fd = F.col("f").cast("decimal(19,0)")
    aggs = [F.sum(F.col("f")).alias("n")]
    for name in names:
        d = F.col(f"dr_{name}").cast("decimal(12,0)")
        aggs.append(F.sum(fd * d).alias(f"s_{name}"))
        aggs.append(F.sum(fd * d * d).alias(f"s_{name}_{name}"))
    for a, b in combinations(names, 2):
        da = F.col(f"dr_{a}").cast("decimal(12,0)")
        db = F.col(f"dr_{b}").cast("decimal(12,0)")
        aggs.append(F.sum(fd * da * db).alias(f"s_{a}_{b}"))
    stats = ranked.agg(*aggs)

    pair_rows = []
    for a, b in combinations(names, 2):
        n = F.col("n").cast("double")
        sx = F.col(f"s_{a}").cast("double")
        sy = F.col(f"s_{b}").cast("double")
        sxy = F.col(f"s_{a}_{b}").cast("double")
        sxx = F.col(f"s_{a}_{a}").cast("double")
        syy = F.col(f"s_{b}_{b}").cast("double")
        num = n * sxy - sx * sy
        den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        pair_rows.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("n").cast("long").alias("n_rows"),
                F.when(den > 0, _round6(num / den)).alias("rho"),
            )
        )
    return stats.select(
        F.explode(F.array(*pair_rows)).alias("p")
    ).select("p.col_x", "p.col_y", "p.n_rows", "p.rho")


# Two-sample comparison: lineitem quantities of returned ('R') vs
# accepted ('A') lines — did the return pipeline see a different
# quantity distribution? Literal group labels (never data-derived).
MW_GROUP_A = "R"
MW_GROUP_B = "A"


def mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between the ``R`` and
    ``A`` return-flag populations of ``l_quantity`` — the
    nonparametric two-sample location test, computed like
    :func:`spearman_corr`: rows collapse into a constant-bounded
    (group, value) contingency table in ONE scan + ONE groupBy, and
    every rank statistic derives from the combined marginal as exact
    integer doubled-ranks (``dr(v) = 2·cum(v) − freq(v) + 1``).

    Doubled rank-sums keep tie-averaged ranks integral: ``2·R_g =
    Σ f_{g,v}·dr(v)`` and ``2·U_g = 2·R_g − n_g(n_g+1)``. The
    tie-corrected normal approximation is one fixed-order IEEE chain
    on exact integers (tie term ``Σ(t³−t)`` accumulates in
    DECIMAL/HUGEINT — t³ overflows BIGINT past ~2M rows per value),
    floor-rounded 1e-6; degenerate variance (a group empty, or every
    value tied) yields NULL. Columns: grp_a, grp_b, n_a, n_b, u2_a,
    u2_b (doubled U statistics — exact integers), z.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_quantity")).cast("long").alias("qv"),
    ).filter(
        F.col("grp").isin(MW_GROUP_A, MW_GROUP_B)
        & F.col("qv").isNotNull()
    )
    # cells fans out into the marginal and the rank join (the
    # spearman_corr multi-consumer shape); ≤ 2·|quantity domain| rows.
    cells = (
        rows.groupBy("grp", "qv")
        .agg(F.count(F.lit(1)).alias("f"))
        .cache()
    )
    marg = cells.groupBy("qv").agg(F.sum("f").alias("mf"))
    w = Window.orderBy("qv").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    md = F.col("mf").cast("decimal(12,0)")
    dr = marg.select(
        "qv",
        (F.lit(2) * F.sum("mf").over(w) - F.col("mf") + F.lit(1)).alias(
            "dr"
        ),
        (md * md * md - md).alias("t3t"),
    )
    j = cells.join(F.broadcast(dr), "qv")
    per = j.groupBy("grp").agg(
        F.sum("f").alias("n"),
        F.sum(
            F.col("f").cast("decimal(12,0)")
            * F.col("dr").cast("decimal(12,0)")
        ).alias("two_r"),
    )
    ties = dr.agg(F.sum("t3t").alias("ties"))
    wide = per.agg(
        F.sum(F.when(F.col("grp") == MW_GROUP_A, F.col("n"))).alias("n_a"),
        F.sum(F.when(F.col("grp") == MW_GROUP_B, F.col("n"))).alias("n_b"),
        F.sum(
            F.when(F.col("grp") == MW_GROUP_A, F.col("two_r"))
        ).alias("two_r_a"),
        F.sum(
            F.when(F.col("grp") == MW_GROUP_B, F.col("two_r"))
        ).alias("two_r_b"),
    ).crossJoin(F.broadcast(ties))
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    n = n_a + n_b
    u2_a = F.col("two_r_a") - (
        F.col("n_a").cast("decimal(19,0)")
        * (F.col("n_a") + 1).cast("decimal(19,0)")
    )
    u2_b = F.col("two_r_b") - (
        F.col("n_b").cast("decimal(19,0)")
        * (F.col("n_b") + 1).cast("decimal(19,0)")
    )
    num = u2_a.cast("double") - n_a * n_b
    den = F.lit(2.0) * F.sqrt(
        (n_a * n_b / F.lit(12.0))
        * (
            (n + F.lit(1.0))
            - F.col("ties").cast("double") / (n * (n - F.lit(1.0)))
        )
    )
    return wide.select(
        F.lit(MW_GROUP_A).alias("grp_a"),
        F.lit(MW_GROUP_B).alias("grp_b"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        u2_a.cast("long").alias("u2_a"),
        u2_b.cast("long").alias("u2_b"),
        F.when(den > 0, _round6(num / den)).alias("z"),
    )
