"""Generate a fat-document twin of a testdata directory.

Round-13 correctness/scale axis #6 (after volume, skew, NULL,
zero-row, unicode): every sweep so far ran on ~50-word documents, so
the per-ROW payload dimension has never been exercised — an operator
can be linear in row count yet quadratic (or memory-unbounded) in
document LENGTH and all five existing axes stay green. Real pretraining
corpora are exactly this shape: most docs small, a heavy tail of
100×–1000× giants.

What goes in (per-doc deterministic, seeded by doc_id):

* ~1% "extreme" docs (~60k words): near the winnow_fingerprint 2^20
  position-packing bound's order of magnitude, big enough that any
  O(len²) per-doc step is seconds-visible;
* ~10% "giant" docs (~8k words);
* ~30% "medium" docs (~1k words);
* the rest untouched as a control group.

Expansion blocks alternate (a) SELF-REPEATS of the doc's own text with
a per-repeat marker word (duplicated long spans — the substring_dedup /
repetition_metrics / containment shape, while the marker keeps it from
degenerating into a period-1 string) and (b) seeded FILLER sentences
from a closed 64-word vocabulary (shifts the unigram/bigram mass the
LM-scoring keys fold over). Pure ASCII — the unicode axis is separate;
NULL text stays NULL. n_chars is recomputed.

Usage: python tools/gen_fatdocs.py [out_dir] [src_dir]
Defaults: /root/repo/.fatdata  /root/testdata/sf0.01
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

SEED = 20260816

VOCAB = (
    "data spark shuffle parquet column filter join window stream batch "
    "model token corpus sample weight vector index bucket merge sort "
    "cache scan stage task executor driver plan query table schema row "
    "group count value score rank label train test split node edge graph "
    "hash band prefix slice block chunk span gram digit lag pair cell "
    "drift trend level shift gap tail state store probe"
).split()
assert len(VOCAB) == 64

WORDS_EXTREME = 60_000
WORDS_GIANT = 8_000
WORDS_MEDIUM = 1_000


def _h(doc_id: int, tag: str) -> int:
    return int(
        hashlib.md5(f"{SEED}|{doc_id}|{tag}".encode()).hexdigest()[:12], 16
    )


def _filler_sentence(doc_id: int, k: int) -> str:
    n = 8 + _h(doc_id, f"fl{k}") % 8
    return " ".join(
        VOCAB[_h(doc_id, f"fw{k}.{j}") % len(VOCAB)] for j in range(n)
    )


def fatten(doc_id: int, text: str | None) -> str | None:
    """Deterministically expand one document to its class's word target."""
    if text is None:
        return None
    r = _h(doc_id, "class") % 100
    if r < 1:
        target = WORDS_EXTREME
    elif r < 11:
        target = WORDS_GIANT
    elif r < 41:
        target = WORDS_MEDIUM
    else:
        return text
    parts = [text]
    words = len(text.split())
    k = 0
    while words < target:
        if _h(doc_id, f"mode{k}") % 2 == 0:
            # self-repeat with a marker word so the expansion is a
            # duplicated long span, not a period-1 degenerate string
            marker = VOCAB[_h(doc_id, f"mk{k}") % len(VOCAB)]
            block = f"{marker}{k} {text}"
        else:
            block = " ".join(
                _filler_sentence(doc_id, k * 31 + j) for j in range(4)
            )
        parts.append(block)
        words += len(block.split())
        k += 1
    return " ".join(parts)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.fatdata"
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
    new_texts = [fatten(d, s) for d, s in zip(doc_ids, texts)]
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

    touched = sum(1 for a, b in zip(texts, new_texts) if a != b)
    total_words = sum(len(s.split()) for s in new_texts if s)
    max_words = max(len(s.split()) for s in new_texts if s)
    manifest = {
        "src": src,
        "seed": SEED,
        "docs": len(doc_ids),
        "fattened": touched,
        "total_words": total_words,
        "max_doc_words": max_words,
        "generated_unix": int(time.time()),
    }
    with open(f"{out_dir}/MANIFEST.json", "w") as fh:
        json.dump(manifest, fh, indent=1)
    print(
        f"[gen_fatdocs] {touched}/{len(doc_ids)} docs fattened "
        f"(total {total_words} words, max {max_words}) "
        f"in {time.time() - t0:.1f}s -> {out_dir}",
        flush=True,
    )


if __name__ == "__main__":
    main()
