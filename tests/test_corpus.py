"""Semantic tests for the corpus-curation operators on CRAFTED docs —
the oracle diff proves engine parity on the synthetic corpus; these
prove the metrics mean what they claim on known inputs."""

from __future__ import annotations

import pytest

from bigdata1_spark.operators import corpus

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "crafted")
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        DOC_SCHEMA,
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_repetition_metrics_known_values(spark, tmp_path):
    docs = _write_docs(
        spark,
        tmp_path,
        [
            ("a a a a", "en", "s"),             # maximally repetitive
            ("u v w x y z", "en", "s"),         # all distinct
            ("b c b c b c", "en", "s"),         # alternating pair
        ],
    )
    out = {r["doc_id"]: r for r in corpus.repetition_metrics(spark, docs).collect()}

    r0 = out[0]  # 4 tokens, 1 distinct; 3 bigrams "a a", 1 distinct
    assert r0["n_tokens"] == 4
    assert r0["dup_word_frac"] == pytest.approx(3 / 4)
    assert r0["top_word_frac"] == pytest.approx(1.0)
    assert r0["dup_bigram_frac"] == pytest.approx(2 / 3)
    assert r0["repetitive"] == 1

    r1 = out[1]  # 6 distinct tokens → top fraction 1/6 < 0.2 gate
    assert r1["dup_word_frac"] == 0.0
    assert r1["top_word_frac"] == pytest.approx(1 / 6)
    assert r1["dup_bigram_frac"] == 0.0
    assert r1["repetitive"] == 0

    r2 = out[2]  # 6 tokens 2 distinct; 5 bigrams, 2 distinct
    assert r2["dup_word_frac"] == pytest.approx(4 / 6)
    assert r2["top_word_frac"] == pytest.approx(3 / 6)
    assert r2["dup_bigram_frac"] == pytest.approx(3 / 5)
    assert r2["repetitive"] == 1


def test_contamination_flags_copied_span(spark, tmp_path):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _write_docs(
        spark,
        tmp_path,
        [
            (bench_text, "en", "src0"),                  # benchmark doc
            (bench_text + " extra tail words", "en", "srcX"),  # copies spans
            ("totally different words only here now", "en", "srcX"),
        ],
    )
    out = {r["doc_id"]: r for r in corpus.contamination_ngrams(spark, docs).collect()}
    assert 0 not in out  # benchmark docs are not scored as candidates
    assert out[1]["contaminated"] == 1
    assert out[1]["n_overlap"] > 0
    assert out[2]["contaminated"] == 0
    assert out[2]["n_overlap"] == 0


def test_mixture_sample_respects_limits(spark, tmp_path):
    from bigdata1_spark.operators.text_analysis import split_bucket
    from pyspark.sql import functions as F

    rows = [(f"doc number {i} words vary", "en" if i % 2 else "zh", "s")
            for i in range(60)]
    docs = _write_docs(spark, tmp_path, rows)
    kept = corpus.mixture_sample(spark, docs)
    # en keeps everything; zh keeps exactly the bucket<64 subset
    src = spark.read.parquet(f"{docs}/documents.parquet").select(
        "doc_id", "lang", split_bucket(F.col("text")).alias("bucket")
    )
    want = {
        r["doc_id"]
        for r in src.collect()
        if r["lang"] == "en" or r["bucket"] < 64
    }
    got = {r["doc_id"] for r in kept.collect()}
    assert got == want
    # bucket column faithfully reports the hash bucket
    for r in kept.collect():
        assert 0 <= r["bucket"] < 256


def test_corpus_ops_survive_edge_docs(spark, tmp_path):
    """Edge-case corpus: empty text, whitespace-only, single word,
    unicode, tabs/newlines mixed — the inputs that crashed round-1
    shingling under ANSI mode. Every operator must run without raising,
    and repetition metrics must match a pure-Python reference."""
    import hashlib
    import re

    rows = [
        ("", "en", "src0"),
        ("   \t  \n ", "en", "srcX"),
        ("solo", "zh", "srcX"),
        ("naïve café über naïve café über naïve", "fr", "srcX"),
        ("a\tb\nc d  e", "es", "srcX"),
        ("x " * 50, "en", "srcX"),
    ]
    docs = _write_docs(spark, tmp_path, rows)

    rep = {r["doc_id"]: r for r in corpus.repetition_metrics(spark, docs).collect()}
    for i, (text, _, _) in enumerate(rows):
        toks = [t for t in re.split(r"\s+", text) if t]
        if not toks:
            assert i not in rep  # token-less docs drop out (both engines)
            continue
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        r = rep[i]
        assert r["n_tokens"] == len(toks)
        assert r["dup_word_frac"] == pytest.approx(
            (len(toks) - len(counts)) / len(toks)
        )
        assert r["top_word_frac"] == pytest.approx(
            max(counts.values()) / len(toks)
        )

    # contamination + mixture just need to run and keep sane bounds
    con = {r["doc_id"]: r for r in corpus.contamination_ngrams(spark, docs).collect()}
    for r in con.values():
        assert 0 <= r["n_overlap"] <= r["n_grams"]

    kept = corpus.mixture_sample(spark, docs).collect()
    for r in kept:
        bucket = int(hashlib.md5(rows[r["doc_id"]][0].encode()).hexdigest()[:2], 16)
        assert r["bucket"] == bucket


def test_sample_stratified_rates_and_determinism(spark, sf_dir):
    """Kept fraction per language must track its configured rate (the
    md5 byte is uniform), and re-running yields the identical sample —
    the reproducibility property ablations rely on."""
    from pyspark.sql import functions as F

    from bigdata1_spark.operators.corpus import (
        STRATA_THRESHOLDS, sample_stratified,
    )
    from bigdata1_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept = {
        r["lang"]: r["n"]
        for r in sample_stratified(spark, sf_dir)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, thresh in STRATA_THRESHOLDS.items():
        if totals.get(lang, 0) < 30:
            continue  # too few docs for a rate assertion
        rate = kept.get(lang, 0) / totals[lang]
        expect = thresh / 256
        assert abs(rate - expect) < 0.2, (lang, rate, expect)
    first = {r["doc_id"] for r in sample_stratified(spark, sf_dir).collect()}
    again = {r["doc_id"] for r in sample_stratified(spark, sf_dir).collect()}
    assert first == again


def test_histogram_partitions_all_rows(spark, sf_dir):
    """Bucket counts must sum to the table size per type (no row lost
    to an off-by-one at the vmax edge), buckets stay in [0, 9], and
    each bucket's bounds nest inside the type's [vmin, vmax]."""
    from pyspark.sql import functions as F

    from bigdata1_spark.operators.relational import histogram
    from bigdata1_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    per_type = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    hist = histogram(spark, sf_dir).collect()
    got = {}
    for r in hist:
        assert 0 <= r["bucket"] <= 9
        assert r["lo"] < r["hi"]
        got[r["event_type"]] = got.get(r["event_type"], 0) + r["cnt"]
    assert got == per_type


def test_doc_entropy_bounds(spark, sf_dir):
    """0 ≤ H ≤ ln(n_tokens) for every doc; a single-token doc has
    exactly H = 0."""
    import math

    from bigdata1_spark.operators.text_analysis import doc_entropy

    for r in doc_entropy(spark, sf_dir).collect():
        # 1e-6 headroom: the floor-6 output rounding can land up to
        # 5e-7 above the exact ln(n) bound for a uniform doc.
        assert -1e-6 <= r["entropy"] <= math.log(max(r["n_tokens"], 2)) + 1e-6


def test_winnow_pack_pos_overflow_guard(spark):
    """_pack_pos must RAISE on a gram position that no longer fits the
    20-bit field (2^20) instead of silently corrupting tie-breaking —
    the oracle packs identically, so only a loud failure is detectable
    (ADVICE r11). The boundary value 2^20-1 still packs fine."""
    from pyspark.sql import functions as F

    lim = corpus._POS_ENC
    ok = spark.range(1).select(
        corpus._pack_pos(F.lit(7), F.lit(lim - 1)).alias("v")
    ).first()["v"]
    assert ok == 7 * lim  # rightmost pos encodes as 0 remainder
    bad = spark.range(1).select(
        corpus._pack_pos(F.lit(7), F.lit(lim)).alias("v")
    )
    # Match on the guard's own message, not a bare Exception: the raise
    # must come from _pack_pos's raise_error branch, not any unrelated
    # failure whose stack trace happens to mention the module (ADVICE
    # r12). raise_error surfaces as USER_RAISED_EXCEPTION /
    # SparkRuntimeException; match= narrows it to this exact sentinel.
    from pyspark.errors import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="overflows the 20-bit"):
        bad.first()


def test_ngram_novelty_matches_pure_python(spark, duck, sf_dir):
    """Novelty vs a from-scratch Python dict walk over the raw texts
    (ASCII \\s+ split, 3-gram windows, first-seen by min doc_id)."""
    import re as _re

    from bigdata1_spark.operators.corpus import ngram_novelty

    rows = {r.doc_id: r for r in ngram_novelty(spark, sf_dir).collect()}
    texts = duck.execute(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL "
        "ORDER BY doc_id"
    ).fetchall()
    doc_grams: dict = {}
    first: dict = {}
    for doc_id, text in texts:
        w = [t for t in _re.split(r"\s+", text) if t]
        if len(w) < 3:
            grams = {" ".join(w)}
        else:
            grams = {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        doc_grams[doc_id] = grams
        for g in grams:
            first.setdefault(g, doc_id)
    assert set(rows) == set(doc_grams)
    for doc_id, grams in doc_grams.items():
        r = rows[doc_id]
        novel = sum(1 for g in grams if first[g] == doc_id)
        assert (r.n_grams, r.n_novel) == (len(grams), novel), doc_id
        assert abs(r.novelty - novel / len(grams)) < 1e-12


def test_zipf_fit_matches_pure_python(spark, tmp_path):
    """OLS of ln(freq) on ln(rank) recomputed in raw Python over a
    crafted corpus with a known rank-frequency ladder, including the
    snap-before-intercept ordering the engine pins."""
    import math

    # word w_i appears (10 - i) times -> exact known counts/ranks
    words = []
    for i in range(8):
        words += [f"w{i}"] * (10 - i)
    docs = _write_docs(spark, tmp_path, [(" ".join(words), "en", "s")])
    row = corpus.zipf_fit(spark, docs).collect()[0]
    counts = sorted(
        [(10 - i, f"w{i}") for i in range(8)],
        key=lambda t: (-t[0], t[1]),
    )
    pts = [
        (
            math.floor(math.log(r + 1) * 1e6 + 0.5),
            math.floor(math.log(c) * 1e6 + 0.5),
        )
        for r, (c, _) in enumerate(counts)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    slope = math.floor((num / denx) * 1e6 + 0.5) / 1e6
    intercept = (
        math.floor(((sy / 1e6 - slope * (sx / 1e6)) / n) * 1e6 + 0.5) / 1e6
    )
    r2 = math.floor(((num * num) / (denx * deny)) * 1e6 + 0.5) / 1e6
    assert row.n_words == n
    assert row.slope == pytest.approx(slope, abs=1e-12)
    assert row.intercept == pytest.approx(intercept, abs=1e-12)
    assert row.r2 == pytest.approx(r2, abs=1e-12)
    assert row.slope < 0 and 0 <= row.r2 <= 1


def test_zipf_fit_degenerate_heads(spark, tmp_path):
    """n < 2 distinct words cannot support a line: stats must be NULL,
    not NaN/inf; the single-word corpus still reports n_words."""
    docs = _write_docs(spark, tmp_path, [("same same same", "en", "s")])
    row = corpus.zipf_fit(spark, docs).collect()[0]
    assert row.n_words == 1
    assert row.slope is None and row.intercept is None and row.r2 is None


def test_source_jaccard_known_overlap(spark, tmp_path):
    """Three crafted sources with hand-countable vocabulary overlap,
    including a NULL source slice and a disjoint pair (jaccard 0)."""
    docs = _write_docs(
        spark,
        tmp_path,
        [
            ("apple banana cherry", "en", "s1"),
            ("banana cherry date", "en", "s2"),
            ("quux zorp", "en", None),
        ],
    )
    rows = {
        (r.src_a, r.src_b): r
        for r in corpus.source_jaccard(spark, docs).collect()
    }
    assert set(rows) == {
        ("<null>", "s1"), ("<null>", "s2"), ("s1", "s2"),
    }
    r = rows[("s1", "s2")]
    assert (r.n_a, r.n_b, r.n_common) == (3, 3, 2)
    assert r.jaccard == pytest.approx(0.5, abs=1e-9)
    r = rows[("<null>", "s1")]
    assert (r.n_a, r.n_b, r.n_common) == (2, 3, 0)
    assert r.jaccard == 0.0


def test_classifier_eval_and_kappa_known_confusion(spark, tmp_path):
    """Crafted docs with a fully hand-computable confusion table:
    2 true-en docs predicted en, 1 true-en predicted fr, 1 true-de
    predicted de, 1 marker-free doc (true de, predicted 'und') and a
    NULL-lang doc predicted en — per-class P/R/F1 and kappa checked
    against the textbook formulas."""
    from bigdata1_spark.operators import text_analysis as ta

    docs = _write_docs(
        spark,
        tmp_path,
        [
            ("the of and", "en", "s"),        # en -> en
            ("the to a", "en", "s"),          # en -> en
            ("le la et", "en", "s"),          # en -> fr
            ("der die das", "de", "s"),       # de -> de
            ("zzz qqq", "de", "s"),           # de -> und
            ("the and", None, "s"),           # <null> -> en
        ],
    )
    rows = {r.cls: r for r in ta.classifier_eval(spark, docs).collect()}
    assert set(rows) == {"en", "de", "fr", "und", "<null>"}
    en = rows["en"]
    assert (en.support, en.tp, en.fp, en.fn) == (3, 2, 1, 1)
    assert en.precision == pytest.approx(2 / 3, abs=1e-6)
    assert en.recall == pytest.approx(2 / 3, abs=1e-6)
    assert en.f1 == pytest.approx(2 * 2 / (3 + 3), abs=1e-6)
    de = rows["de"]
    assert (de.support, de.tp, de.fp, de.fn) == (2, 1, 0, 1)
    assert de.precision == 1.0 and de.recall == 0.5
    fr = rows["fr"]
    assert (fr.support, fr.tp, fr.fp) == (0, 0, 1)
    assert fr.precision == 0.0 and fr.recall is None and fr.f1 == 0.0
    nl = rows["<null>"]
    assert (nl.support, nl.tp, nl.fn) == (1, 0, 1)

    k = ta.cohens_kappa(spark, docs).collect()[0]
    # n=6, D=3; S = sum over classes of support*predicted:
    # en 3*3 + de 2*1 + fr 0*1 + und 0*1 + <null> 1*0 = 11
    import math

    n, D, S = 6, 3, 11
    assert k.n_docs == n
    assert k.observed_agreement == pytest.approx(
        math.floor(D / n * 1e6 + 0.5) / 1e6, abs=1e-12
    )
    assert k.expected_agreement == pytest.approx(
        math.floor(S / n**2 * 1e6 + 0.5) / 1e6, abs=1e-12
    )
    want = math.floor((n * D - S) / (n * n - S) * 1e6 + 0.5) / 1e6
    assert k.kappa == pytest.approx(want, abs=1e-12)


def test_cohens_kappa_degenerate_constant_table(spark, tmp_path):
    """A constant predictor over a constant truth drives p_e to 1 —
    kappa must be NULL (0/0), agreements exactly 1."""
    from bigdata1_spark.operators import text_analysis as ta

    docs = _write_docs(
        spark, tmp_path, [("the of", "en", "s"), ("the and", "en", "s")]
    )
    k = ta.cohens_kappa(spark, docs).collect()[0]
    assert k.n_docs == 2
    assert k.observed_agreement == 1.0
    assert k.expected_agreement == 1.0
    assert k.kappa is None
