"""Statistical-profiling operators (operators/stats.py): independent
math checks on top of the mirrored-expression oracle in
test_oracle_diff.py — these compare against DuckDB's own corr()/chi2
formulations computed a DIFFERENT way, so an error in the shared
sufficient-statistics algebra (which a mirrored oracle would replicate)
fails here.
"""

from __future__ import annotations

import math

from bigdata1_spark.operators import stats as stats_ops

SRC = {"quantity": "l_quantity", "price": "l_extendedprice",
       "discount": "l_discount", "tax": "l_tax"}


def test_corr_matrix_matches_duckdb_builtin(spark, duck, sf_dir):
    """Our one-pass scaled-integer r vs DuckDB's builtin corr() over the
    raw doubles (Welford-style, different algorithm AND different
    scaling) — agreement within 1e-6 validates the algebra itself."""
    rows = {(r.col_x, r.col_y): r for r in
            stats_ops.corr_matrix(spark, sf_dir).collect()}
    assert len(rows) == 6
    for (cx, cy), r in rows.items():
        ref = duck.execute(
            f"SELECT corr({SRC[cx]}, {SRC[cy]}) FROM lineitem "
            f"WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL "
            f"AND l_discount IS NOT NULL AND l_tax IS NOT NULL"
        ).fetchone()[0]
        assert r.corr is not None and abs(r.corr - ref) < 1e-6, (cx, cy)
        assert -1.0 <= r.corr <= 1.0


def test_corr_matrix_single_n(spark, sf_dir):
    """Listwise deletion contract: every pair reports the same n."""
    ns = {r.n_rows for r in stats_ops.corr_matrix(spark, sf_dir).collect()}
    assert len(ns) == 1 and ns.pop() > 0


def test_mutual_info_nonnegative_and_marginals(spark, sf_dir):
    """MI of any joint distribution is >= 0; marginals must re-sum to
    the total within each partition of the cell table."""
    rows = stats_ops.mutual_info(spark, sf_dir).collect()
    assert rows
    n_total = rows[0].n_total
    assert all(r.n_total == n_total for r in rows)
    assert sum(r.n_xy for r in rows) == n_total
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, (r.n_lang, []))[1].append(r.n_xy)
    for lang, (n_lang, cells) in by_lang.items():
        assert sum(cells) == n_lang, lang
    mi = sum(r.mi_term for r in rows)
    assert mi >= -len(rows) * 5e-7  # rounding slack only


def test_chi_square_matches_direct_formula(spark, duck, sf_dir):
    """Summed chi2 vs a from-scratch DuckDB computation (independent
    query shape: scalar subqueries, no windows)."""
    rows = stats_ops.chi_square_assoc(spark, sf_dir).collect()
    assert all(r.chi2_term >= 0 for r in rows)
    got = sum(r.chi2_term for r in rows)
    ref = duck.execute(
        """
        WITH c AS (SELECT lang, source, COUNT(*)::DOUBLE AS o
                   FROM documents GROUP BY 1, 2),
        lx AS (SELECT lang, SUM(o) AS nl FROM c GROUP BY 1),
        sx AS (SELECT source, SUM(o) AS ns FROM c GROUP BY 1),
        t AS (SELECT SUM(o) AS n FROM c)
        SELECT SUM((o - nl * ns / n) * (o - nl * ns / n) / (nl * ns / n))
        FROM c JOIN lx USING (lang) JOIN sx USING (source), t
        """
    ).fetchone()[0]
    assert math.isfinite(got) and abs(got - ref) < len(rows) * 1e-6


def test_stats_scan_budgets(spark, sf_dir):
    """Each operator reads its base table exactly once (the contingency
    marginals come from windows over the aggregated cell table, not a
    rescan)."""
    from tests.test_plans import _unique_scan_count

    assert _unique_scan_count(stats_ops.corr_matrix(spark, sf_dir)) == 1
    assert _unique_scan_count(stats_ops.mutual_info(spark, sf_dir)) == 1
    assert _unique_scan_count(
        stats_ops.chi_square_assoc(spark, sf_dir)
    ) == 1


def test_spearman_matches_pandas(spark, duck, sf_dir):
    """Our contingency-table Spearman (doubled average ranks, never a
    row-level rank) vs pandas' corr(method='spearman') over per-row
    ranks of the raw doubles — a fully independent algorithm; ranks are
    invariant under the fixed-point scaling, so values must agree."""
    pdf = duck.execute(
        """
        SELECT l_quantity AS quantity, l_discount AS discount,
               l_tax AS tax
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
          AND l_tax IS NOT NULL
        """
    ).df()
    ref = pdf.corr(method="spearman")
    rows = {(r.col_x, r.col_y): r for r in
            stats_ops.spearman_corr(spark, sf_dir).collect()}
    assert len(rows) == 3
    n = len(pdf)
    for (cx, cy), r in rows.items():
        assert r.n_rows == n
        assert r.rho is not None and abs(r.rho - ref.loc[cx, cy]) < 1e-6
        assert -1.0 <= r.rho <= 1.0


def test_spearman_scan_budget(spark, sf_dir):
    """One lineitem scan: marginals and rank maps all derive from the
    cached cell table, never a rescan."""
    from tests.test_plans import _unique_scan_count

    # <= because a prior test's materialized cells cache planes the
    # whole subtree as InMemoryTableScan (0 parquet scans).
    assert _unique_scan_count(stats_ops.spearman_corr(spark, sf_dir)) <= 1


def test_rrf_fusion_recomputes_from_member_lists(spark, sf_dir):
    """Every fused row's rrf must equal the formula re-applied to the
    ranks it reports, every doc must come from at least one retriever
    list, and the emitted rnk must be consistent with rrf ordering."""
    from bigdata1_spark.operators.ir import RRF_C, RRF_TOP_K, rrf_fusion

    rows = sorted(rrf_fusion(spark, sf_dir).collect(), key=lambda r: r.rnk)
    assert 0 < len(rows) <= RRF_TOP_K
    prev = None
    for r in rows:
        assert r.lex_rnk is not None or r.dense_rnk is not None
        want = 0.0
        if r.lex_rnk is not None:
            want += 1.0 / (RRF_C + r.lex_rnk)
        if r.dense_rnk is not None:
            want += 1.0 / (RRF_C + r.dense_rnk)
        assert abs(r.rrf - want) < 2e-6, r
        if prev is not None:
            assert prev >= r.rrf - 2e-6  # non-increasing in rank order
        prev = r.rrf
