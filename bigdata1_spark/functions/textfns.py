"""Text column expressions — tokenization, shingling, stopwords.

All pure built-in column expressions (whole-stage codegen, no Python in
the hot path). Tokenization is regex whitespace-split with empty-token
filtering, chosen to behave identically to DuckDB's
``string_split_regex(text, '\\s+')`` so oracle queries can mirror it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny multilingual stopword/marker lists for lang-id and quality scoring.
# Deliberately small and inlined: they broadcast as literals.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "y", "una"),
    "de": ("der", "die", "das", "und", "ein"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

STOPWORDS: tuple[str, ...] = tuple(
    sorted({w for ws in LANG_MARKERS.values() for w in ws})
)


def tokens(col: Column) -> Column:
    """Whitespace tokens with empties dropped (ARRAY<STRING>)."""
    return F.filter(F.split(col, r"\s+"), lambda t: F.length(t) > 0)


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a token array (ARRAY<STRING>).

    Documents shorter than n tokens yield a single shingle of the whole
    document so every doc has ≥1 shingle (keeps minhash total).
    """
    from bigdata1_spark.functions.hashing import let

    def body(tk: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - (n - 1), F.lit(1)))
        return F.array_distinct(
            F.transform(
                idx,
                # F.get (0-based) is NULL-safe out of bounds where
                # element_at raises under ANSI — short/empty docs yield
                # one whole-doc shingle ('' for an empty token list)
                lambda i: F.concat_ws(
                    " ", *[F.get(tk, i + j - 1) for j in range(n)]
                ),
            )
        )

    # let-bind the token array: ``toks`` is usually an inlined
    # split-of-text expression, and it is referenced n times inside the
    # per-shingle lambda — without the binding the whole document gets
    # re-tokenized once per shingle per position.
    return let(toks, body)
