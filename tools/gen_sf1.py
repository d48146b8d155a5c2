"""Generate a bench-only sf1 dataset (10x sf0.1) for the scaling curve.

VERDICT r07 item 1: every 100 TB argument in SCALE.md was plan-shape
only; this script provides the second measured scale point. It is NOT
driver testdata — correctness oracles keep running against the driver's
read-only /root/testdata dirs — so distributional fidelity matters, not
bit parity with the driver's generator.

Strategy: 10 key-shifted replicas of sf0.1. Fact/dim keys are offset by
replica * N(table) so FK joins stay consistent within a replica and key
cardinality grows 10x (the realistic scale direction: more customers /
users / docs, not denser groups). region/nation stay fixed (TPC-H dims
are SF-invariant). Two tables are NOT copied verbatim:

- documents: replicas > 0 get REGENERATED text (seeded numpy draws over
  the sf0.1 vocabulary, per-doc token count preserved) — verbatim copies
  would make every replica group an artificial 10-doc near-dup cluster
  and quadratically distort the dedup keys' outputs.
- embeddings: replicas > 0 add seeded N(0, 0.02) noise per vector, so
  cluster/label structure survives for the IVF keys but no vector is an
  exact duplicate (which would put 10 identical points in every LSH
  bucket).

Deterministic (fixed seeds). Output dir defaults to /root/repo/.sf1data
(gitignored — ~170 MB of parquet does not belong in history).

Usage: python tools/gen_sf1.py [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
# GEN_REPLICAS=30 turns the same generator into an sf3 third scale
# point (two points give a ratio; three give a slope with confidence)
REPLICAS = int(os.environ.get("GEN_REPLICAS", "10"))
SEED = 20260814

# key column -> tables that carry it (offset = replica * N(owning table))
KEYED = {
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", "users")],
}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1data"
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    counts = {
        t: con.execute(f"SELECT count(*) FROM {src(t)}").fetchone()[0]
        for t in [
            "customer", "supplier", "part", "orders", "lineitem",
            "events", "documents", "embeddings",
        ]
    }
    # Replica offsets stride by max(key)+1, NOT count(*): with sparse
    # keys (standard TPC-H o_orderkey peaks near 4x count) a count
    # stride would overlap replicas, producing duplicate primary keys
    # and many-to-many FK joins that distort the bench (ADVICE r8).
    # This sf0.1 dataset happens to be dense 0-based, so both agree —
    # the stride form stays correct if the source generator changes.
    _PK = {
        "customer": "c_custkey", "supplier": "s_suppkey",
        "part": "p_partkey", "orders": "o_orderkey",
        "events": "event_id", "documents": "doc_id",
        "embeddings": "vec_id",
    }
    sizes = dict(counts)
    for t, pk in _PK.items():
        sizes[t] = con.execute(
            f"SELECT max({pk}) + 1 FROM {src(t)}"
        ).fetchone()[0]
    sizes["users"] = con.execute(
        f"SELECT max(user_id) + 1 FROM {src('events')}"
    ).fetchone()[0]

    # SF-invariant dims: straight copy
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM {src(t)}) TO '{out_dir}/{t}.parquet'"
        )

    # key-shifted replicas via one UNION-free generate_series cross join
    for t, keys in KEYED.items():
        offsets = ", ".join(
            f"{col} + r.i * {sizes[owner]} AS {col}" for col, owner in keys
        )
        keyed_cols = {col for col, _ in keys}
        rest = [
            c[0]
            for c in con.execute(f"DESCRIBE SELECT * FROM {src(t)}").fetchall()
            if c[0] not in keyed_cols
        ]
        cols = ", ".join([offsets] + [f'"{c}"' for c in rest])
        con.execute(
            f"""COPY (
              SELECT {cols}
              FROM {src(t)} CROSS JOIN
                   (SELECT unnest(generate_series(0, {REPLICAS - 1})) AS i) r
            ) TO '{out_dir}/{t}.parquet'"""
        )
        print(f"[gen_sf1] {t}: {counts[t]} -> {counts[t] * REPLICAS}",
              flush=True)

    # documents: replica 0 verbatim; replicas 1..9 regenerated text over
    # the sf0.1 vocabulary with per-doc token counts preserved
    docs = con.execute(
        f"SELECT doc_id, text, lang, source FROM {src('documents')} "
        "ORDER BY doc_id"
    ).fetchall()
    vocab = sorted({w for _, text, _, _ in docs for w in text.split()})
    rng = np.random.default_rng(SEED)
    n_docs = sizes["documents"]
    out_rows = {"doc_id": [], "text": [], "lang": [], "source": [],
                "n_chars": []}
    for rep in range(REPLICAS):
        for doc_id, text, lang, source in docs:
            if rep == 0:
                new_text = text
            else:
                n_tok = len(text.split())
                idx = rng.integers(0, len(vocab), size=n_tok)
                new_text = " ".join(vocab[j] for j in idx)
            out_rows["doc_id"].append(doc_id + rep * n_docs)
            out_rows["text"].append(new_text)
            out_rows["lang"].append(lang)
            out_rows["source"].append(source)
            out_rows["n_chars"].append(len(new_text))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out_rows["doc_id"], pa.int64()),
                "text": pa.array(out_rows["text"], pa.string()),
                "lang": pa.array(out_rows["lang"], pa.string()),
                "source": pa.array(out_rows["source"], pa.string()),
                "n_chars": pa.array(out_rows["n_chars"], pa.int64()),
            }
        ),
        f"{out_dir}/documents.parquet",
    )
    print(f"[gen_sf1] documents: {n_docs} -> {n_docs * REPLICAS}", flush=True)

    # embeddings: replica 0 verbatim; later replicas perturbed with
    # seeded gaussian noise (cluster structure kept, exact dups avoided)
    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM {src('embeddings')} "
        "ORDER BY vec_id"
    ).fetchall()
    n_vec = sizes["embeddings"]
    dim = len(emb[0][1])
    base = np.array([e[1] for e in emb], dtype=np.float32)
    labels = [e[2] for e in emb]
    vec_ids, vecs, out_labels = [], [], []
    for rep in range(REPLICAS):
        noise = (
            np.zeros_like(base)
            if rep == 0
            else rng.normal(0.0, 0.02, size=base.shape).astype(np.float32)
        )
        pert = base + noise
        for k, (vid, _, lab) in enumerate(emb):
            vec_ids.append(vid + rep * n_vec)
            vecs.append(pert[k].tolist())
            out_labels.append(lab)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(out_labels, pa.int32()),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )
    print(f"[gen_sf1] embeddings: {n_vec} -> {n_vec * REPLICAS} (dim {dim})",
          flush=True)

    manifest = {
        "src": SRC,
        "replicas": REPLICAS,
        "seed": SEED,
        "generated_unix": int(time.time()),
        "rows": {
            t: (counts[t] * REPLICAS
                if t not in ("region", "nation") else None)
            for t in counts
        },
    }
    with open(f"{out_dir}/MANIFEST.json", "w") as fh:
        json.dump(manifest, fh, indent=1)
    print(f"[gen_sf1] done in {time.time() - t0:.1f}s -> {out_dir}",
          flush=True)


if __name__ == "__main__":
    main()
