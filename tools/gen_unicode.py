"""Generate a unicode-stressed twin of a testdata directory.

Round-13 correctness axis #5 (after volume, skew, NULL, zero-row): the
base generator emits pure-ASCII text, so every sweep has been blind to
the places multibyte text can split Spark (JVM UTF-16 semantics) from
DuckDB (UTF-8 / utf8proc): code-point vs byte vs grapheme LENGTH,
regex character classes, case mapping, normalization, substring
indexing, and binary sort order of multibyte strings.

What goes in (per-doc deterministic, seeded by doc_id): CJK runs,
emoji incl. ZWJ family sequences, precomposed AND combining-mark
accents (exercises the NFC key both ways), RTL Arabic/Hebrew,
full-width forms, Cyrillic, lowercase Greek, astral-plane
mathematical letters, NBSP / ideographic space (NOT ASCII \\s — both
engines' \\s is ASCII-only, measured). ~20% of docs stay untouched as
an ASCII control group.

What stays out — measured per-code-point with both engines this round
(sweep of U+0080..U+2FFF + fullwidth + two astral blocks, each char
probed in initial/medial/final/isolated position):

* the 4 lower()-divergent code points U+0130 İ (Java emits i +
  combining dot, DuckDB plain i), U+03A3 Σ (Java applies the
  context-sensitive final-sigma rule, DuckDB maps blindly to σ),
  U+1C89 and U+2C2F — `text_normalize` lower()s document text, so
  these would diverge BY ENGINE DESIGN, not by our bug;
* the 94 upper()-divergent code points (ß-class expansions) for
  future-proofing — nothing upper()s document text today;
* everything else agreed: length (0 divergences), \\s+ splitting,
  [a-zA-Z0-9]-class regexes, substring, binary ordering.

n_chars is recomputed as the code-point count of the new text (both
engines' length() semantics, measured identical).

Usage: python tools/gen_unicode.py [out_dir] [src_dir]
Defaults: /root/repo/.unicodedata  /root/testdata/sf0.01
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260815

# Decoration pools. Every code point verified cross-engine-safe for the
# operations the registry applies to document text (see module doc).
POOLS = [
    # CJK
    ["你好世界", "数据处理", "東京都", "机器学习", "画像認識"],
    # emoji incl. ZWJ sequences and skin-tone modifiers
    ["👍🔥", "👩‍👩‍👧", "🚀✨", "🧑🏽‍💻", "🎉"],
    # precomposed accents
    ["café", "naïve", "Zürich", "résumé", "piñata"],
    # combining marks (NFC-normalizable to the precomposed forms)
    ["café", "über", "ñand́u", "étude"],
    # RTL Arabic + Hebrew
    ["مرحبا", "שלום", "بيانات", "עולם"],
    # full-width forms
    ["ＡＢＣ１２３", "ｄａｔａ", "５６７"],
    # Cyrillic
    ["привет", "данные", "мир"],
    # lowercase Greek (caps excluded: Σ is lower()-divergent)
    ["αλφα", "βητα", "λογος", "σίσυφος"],
    # astral-plane mathematical alphanumerics
    ["𝕊𝕡𝕒𝕣𝕜", "𝒜ℬ𝒞", "𝔻𝔼"],
    # exotic whitespace-adjacent (NBSP, ideographic space — neither is
    # ASCII \s, so tokens() keeps them inside one token in BOTH engines)
    ["a b", "c　d"],
]


def _h(doc_id: int, tag: str) -> int:
    return int(
        hashlib.md5(f"{SEED}|{doc_id}|{tag}".encode()).hexdigest()[:12], 16
    )


def decorate(doc_id: int, text: str | None) -> str | None:
    """Deterministically weave unicode snippets into one document."""
    if text is None:
        return None
    if _h(doc_id, "keep") % 5 == 0:  # ~20% ASCII control group
        return text
    n_dec = 1 + _h(doc_id, "n") % 3
    parts = text.split(" ")
    for i in range(n_dec):
        pool = POOLS[_h(doc_id, f"pool{i}") % len(POOLS)]
        snip = pool[_h(doc_id, f"snip{i}") % len(pool)]
        mode = _h(doc_id, f"mode{i}") % 4
        if mode == 0:  # append
            parts.append(snip)
        elif mode == 1:  # prepend
            parts.insert(0, snip)
        elif mode == 2 and len(parts) > 1:  # inject mid-text
            parts.insert(1 + _h(doc_id, f"pos{i}") % (len(parts) - 1), snip)
        else:  # glue onto an existing word (mixed-script token)
            j = _h(doc_id, f"pos{i}") % len(parts)
            parts[j] = parts[j] + snip
    return " ".join(parts)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.unicodedata"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings",
    ):
        shutil.copyfile(f"{src}/{t}.parquet", f"{out_dir}/{t}.parquet")

    tbl = pq.read_table(f"{src}/documents.parquet")
    doc_ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    new_texts = [decorate(d, s) for d, s in zip(doc_ids, texts)]
    n_chars = [len(s) if s is not None else None for s in new_texts]
    ti = tbl.schema.get_field_index("text")
    tbl = tbl.set_column(
        ti, tbl.schema.field(ti), pa.array(new_texts, type=pa.string())
    )
    ci = tbl.schema.get_field_index("n_chars")
    tbl = tbl.set_column(
        ci,
        tbl.schema.field(ci),
        pa.array(n_chars, type=tbl.schema.field(ci).type),
    )
    pq.write_table(tbl, f"{out_dir}/documents.parquet")

    touched = sum(
        1 for a, b in zip(texts, new_texts) if a != b
    )
    manifest = {
        "src": src,
        "seed": SEED,
        "docs": len(doc_ids),
        "decorated": touched,
        "generated_unix": int(time.time()),
    }
    with open(f"{out_dir}/MANIFEST.json", "w") as fh:
        json.dump(manifest, fh, indent=1)
    print(
        f"[gen_unicode] {touched}/{len(doc_ids)} docs decorated "
        f"in {time.time() - t0:.1f}s -> {out_dir}",
        flush=True,
    )


if __name__ == "__main__":
    main()
