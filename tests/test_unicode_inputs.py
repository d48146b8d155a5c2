"""Unicode twin regressions (round-13 stress axis #5, after volume /
skew / NULL / zero-row): documents.text decorated with CJK, emoji (incl.
ZWJ sequences), precomposed AND combining accents, RTL scripts,
full-width forms, astral-plane letters, and non-ASCII whitespace
(NBSP / U+3000) — the text shapes a real crawl corpus carries that the
pure-ASCII base generator never exercises.

The full-registry sweep runs via ``tools/gen_unicode.py`` +
``tools/local_correctness.py`` (banked as
CORRECTNESS_local_r13_unicode); this file pins the divergence that
sweep caught so it can't regress:

* udtf_analyze: Python ``str.split()`` splits on UNICODE whitespace
  (NBSP, U+3000) while both engines' ``\\s+`` is ASCII-only — every
  Python-side tokenizer must use ``re.split(r"\\s+", s, flags=re.ASCII)``
  to honor the repo-wide tokens() contract.

Cross-engine semantics were MEASURED this round (per-code-point sweep,
each char probed in initial/medial/final/isolated position):
length / \\s+ / ASCII-class regexes / substring / binary ordering agree
on everything probed; lower() diverges on exactly 4 code points
(U+0130 İ, U+03A3 Σ context-sensitive final sigma, U+1C89, U+2C2F) and
upper() on 94 (ß-class expansions) — those stay OUT of the twin's
pools because the engines disagree BY DESIGN (Java SpecialCasing vs
utf8proc simple mapping), documented in tools/gen_unicode.py.
"""

from __future__ import annotations

import duckdb
import pytest

from bigdata1_spark import registry
from tests.oracle import assert_matches_oracle

# The caught bug plus the fast text-surface representatives most
# likely to regress under multibyte input (tokenization, char/token
# counting, NFC normalization, chunk substring arithmetic, per-word
# grouping and binary word ordering).
PINNED_KEYS = (
    "udtf_analyze",
    "text_stats",
    "token_count",
    "text_normalize",
    "doc_chunking",
    "quality_filters",
    "lang_id",
    "heavy_hitters",
)


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory, sf_dir) -> str:
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata1_spark.sources.tables import TABLES
    from tools.gen_unicode import decorate

    out = tmp_path_factory.mktemp("unicodedata")
    for t in TABLES:
        if t != "documents":
            shutil.copyfile(
                f"{sf_dir}/{t}.parquet", str(out / f"{t}.parquet")
            )
    tbl = pq.read_table(f"{sf_dir}/documents.parquet")
    ids = tbl.column("doc_id").to_pylist()
    texts = [decorate(d, s) for d, s in zip(ids, tbl.column("text").to_pylist())]
    ti = tbl.schema.get_field_index("text")
    tbl = tbl.set_column(
        ti, tbl.schema.field(ti), pa.array(texts, type=pa.string())
    )
    ci = tbl.schema.get_field_index("n_chars")
    tbl = tbl.set_column(
        ci,
        tbl.schema.field(ci),
        pa.array(
            [len(s) if s is not None else None for s in texts],
            type=tbl.schema.field(ci).type,
        ),
    )
    pq.write_table(tbl, str(out / "documents.parquet"))
    return str(out)


@pytest.fixture(scope="module")
def unicode_duck(unicode_dir):
    from bigdata1_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{unicode_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", PINNED_KEYS)
def test_unicode_input_matches_oracle(key, spark, unicode_duck, unicode_dir):
    df = registry.QUERIES[key](spark, unicode_dir)
    assert_matches_oracle(df, unicode_duck, registry.ORACLES[key], key=key)
    spark.catalog.clearCache()


def test_udtf_analyze_ascii_whitespace_contract(spark, unicode_dir):
    """NBSP / U+3000 must stay INSIDE tokens: the per-doc word count
    from the UDTF must equal the built-in tokens() count for every
    document (str.split() would overcount on decorated docs)."""
    from pyspark.sql import functions as F

    from bigdata1_spark.functions.textfns import tokens
    from bigdata1_spark.operators.api_surface import udtf_analyze
    from bigdata1_spark.sources.tables import load_table

    got = {
        r["doc_id"]: r["n_words"]
        for r in udtf_analyze(spark, unicode_dir).collect()
    }
    want = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, unicode_dir, "documents")
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .collect()
    }
    # tokens() of NULL text is -1 via size(); the UDTF emits 0 words —
    # compare only non-null-text docs (none exist in the base fixture)
    assert got == {k: max(v, 0) for k, v in want.items()}
