"""Property-based tests (hypothesis) for the column-expression function
layer — the pieces whose correctness everything else leans on.

Strategy: generate small random corpora, evaluate the Spark expression,
compare against a straightforward Python reference implementation.
One shared session; data round-trips via createDataFrame.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from bigdata1_spark.functions import hashing, textfns

WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)
DOC = st.lists(WORD, min_size=0, max_size=30)

SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_tokens(text: str) -> list[str]:
    return [t for t in __import__("re").split(r"\s+", text) if t]


def _py_shingles(toks: list[str], n: int = 3) -> list[str]:
    if not toks:
        return [""]
    upper = max(len(toks) - (n - 1), 1)
    out = []
    for i in range(upper):
        out.append(" ".join(toks[i:i + n]))
    seen, uniq = set(), []
    for s in out:
        if s not in seen:
            seen.add(s)
            uniq.append(s)
    return uniq


@given(docs=st.lists(DOC, min_size=1, max_size=8))
@SETTINGS
def test_tokens_and_shingles_match_reference(spark, docs):
    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(
        textfns.tokens(F.col("text")).alias("toks"),
        textfns.word_shingles(textfns.tokens(F.col("text")), 3).alias("sh"),
    ).collect()
    for text, row in zip(texts, rows):
        toks = _py_tokens(text)
        assert row["toks"] == toks
        assert row["sh"] == _py_shingles(toks)


@given(docs=st.lists(st.lists(WORD, min_size=1, max_size=25), min_size=2,
                     max_size=6))
@SETTINGS
def test_minhash_estimates_jaccard(spark, docs):
    """Signature agreement rate must be a plausible Jaccard estimate:
    exact-equal sets agree on every component; disjoint sets agree on
    (almost) none; and the estimate is within a loose Hoeffding band."""
    df = spark.createDataFrame(
        [(i, list(dict.fromkeys(d))) for i, d in enumerate(docs)],
        ["doc_id", "toks"],
    )
    sig = df.select(
        "doc_id", "toks",
        hashing.minhash_signature(F.col("toks"), k=32).alias("sig"),
    ).collect()
    for a in sig:
        for b in sig:
            if a["doc_id"] >= b["doc_id"]:
                continue
            sa, sb = set(a["toks"]), set(b["toks"])
            jacc = len(sa & sb) / len(sa | sb)
            agree = sum(x == y for x, y in zip(a["sig"], b["sig"])) / 32
            if jacc == 1.0:
                assert agree == 1.0
            else:
                # k=32 → band of ~4 sigma ≈ 0.36
                assert abs(agree - jacc) <= 0.40


@given(vals=st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=50))
@SETTINGS
def test_let_binding_is_transparent(spark, vals):
    """let(x, f) must equal f(x) for pure column expressions."""
    df = spark.createDataFrame([(vals,)], ["xs"])
    direct = df.select(
        (F.array_max("xs") - F.array_min("xs")).alias("r")
    ).first()["r"]
    bound = df.select(
        hashing.let(
            F.col("xs"), lambda x: F.array_max(x) - F.array_min(x)
        ).alias("r")
    ).first()["r"]
    assert direct == bound


def test_simhash_long_docs_match_per_bit_reference(spark):
    """Docs with >255 distinct shingles fold over their bottom-255 hash
    values; the packed 8-bit-lane arithmetic must equal a naive one-fold-
    per-bit majority over the same capped multiset (this is exactly the
    computation that lane-carry overflow used to corrupt)."""
    docs = [
        (0, [f"tok{i}" for i in range(600)]),
        (1, [f"tok{i}" for i in range(590)] + [f"alt{i}" for i in range(10)]),
        (2, [f"other{i}" for i in range(600)]),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "sh"])
    capped = F.slice(
        F.array_sort(F.transform(F.col("sh"), lambda s: F.xxhash64(s))),
        1,
        hashing.SIMHASH_MAX_SHINGLES,
    )
    def bit_fold(b):  # bind the loop variable (aggregate wants 2-arg lambdas)
        return lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(
            F.lit(1).cast("long")
        )

    naive = F.lit(0).cast("long")
    for b in range(64):
        ones = F.aggregate(capped, F.lit(0).cast("long"), bit_fold(b))
        bit = (
            F.when(ones * 2 >= F.size(capped), F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        naive = naive + F.shiftleft(bit, b)
    rows = df.select(
        "doc_id",
        hashing.simhash64(F.col("sh")).alias("packed"),
        naive.alias("naive"),
    ).collect()
    fps = {}
    for r in rows:
        assert r["packed"] == r["naive"], f"doc {r['doc_id']} lane overflow"
        fps[r["doc_id"]] = r["packed"]
    # near-identical long docs stay near; unrelated docs stay far
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")  # noqa: E731
    assert ham(fps[0], fps[1]) < ham(fps[0], fps[2])


@given(texts=st.lists(st.text(max_size=40), min_size=1, max_size=10))
@SETTINGS
def test_simhash_identical_docs_zero_hamming(spark, texts):
    """Identical token sets → identical fingerprints; fingerprint is a
    pure function of the shingle set."""
    df = spark.createDataFrame([(t,) for t in texts] * 2, ["text"])
    fp = df.select(
        "text",
        hashing.simhash64(
            textfns.word_shingles(textfns.tokens(F.col("text")), 3)
        ).alias("fp"),
    ).collect()
    by_text: dict[str, set[int]] = {}
    for r in fp:
        by_text.setdefault(r["text"], set()).add(r["fp"])
    for fps in by_text.values():
        assert len(fps) == 1
