"""Generate a NULL-injected twin of a testdata directory.

Round-13 correctness axis (the skew-axis playbook applied to NULL
semantics): the TPC-H-ish generators emit **zero NULLs**, so every
sweep ever run has been blind to the places Spark and DuckDB disagree
about NULL — default null ORDERING (Spark ASC = NULLS FIRST, DuckDB
defaults to NULLS LAST, so any ordered-prefix row SET can diverge),
NULL grouping keys, NULL propagation through windows / ranges /
arithmetic, aggregate skipping (COUNT(col) vs COUNT(*), SUM over
all-NULL), join keys that never match, and filter predicates where
NULL is neither true nor false.

The injection is seeded and row-deterministic (a pure function of the
row's primary key, NOT of row order), so both engines see the exact
same NULL pattern and every oracle remains a valid twin. Primary keys,
foreign keys, event timestamps (streaming watermarks need real event
time) and embedding vectors stay NOT NULL; everything else nullable a
real warehouse would allow gets ~NULL_RATE of its values dropped.

Usage: python tools/gen_nulls.py [out_dir] [src_dir]
Defaults: /root/repo/.nulldata  /root/testdata/sf0.01
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260815
# ~3% of values per injected column; NULL_RATE env overrides (the 30%
# stress twin drives whole groups/frames to all-NULL, which the 3%
# rate only grazes)
NULL_RATE = float(os.environ.get("NULL_RATE", "0.03"))

# table -> (pk column used to derive the mask, [columns to inject])
INJECT = {
    "lineitem": (
        "l_orderkey",
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
         "l_returnflag", "l_linestatus", "l_shipdate"],
    ),
    "orders": (
        "o_orderkey",
        ["o_orderstatus", "o_totalprice", "o_orderdate",
         "o_orderpriority"],
    ),
    "events": ("event_id", ["event_type", "value", "props"]),
    "documents": ("doc_id", ["text", "lang", "source", "n_chars"]),
}

COPY_VERBATIM = (
    "region", "nation", "customer", "supplier", "part", "embeddings",
)


def _null_mask(pk: np.ndarray, col: str) -> np.ndarray:
    """Deterministic per-(pk, column) mask: splitmix-style hash of the
    key mixed with the column name — row-order independent, identical
    in any engine that re-derives it (none needs to: the parquet IS
    the shared ground truth)."""
    import hashlib

    h = pk.astype(np.uint64)
    salt = np.uint64(
        int(hashlib.md5(f"{SEED}|{col}".encode()).hexdigest()[:8], 16)
    )
    h = (h + salt) * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(31)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    return (h % np.uint64(10_000)) < np.uint64(int(NULL_RATE * 10_000))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.nulldata"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    for t in COPY_VERBATIM:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out_dir}/{t}.parquet")

    stats: dict[str, dict] = {}
    for t, (pk_col, cols) in INJECT.items():
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pk = tbl.column(pk_col).to_numpy()
        for col in cols:
            mask = _null_mask(pk, col)
            idx = tbl.schema.get_field_index(col)
            arr = tbl.column(idx)
            # combine_chunks -> single array; rebuild with the mask as
            # the validity bitmap (keep original values where valid)
            flat = arr.combine_chunks()
            nulled = pa.array(
                flat.to_pandas().where(~mask, other=None),
                type=flat.type,
            )
            tbl = tbl.set_column(idx, tbl.schema.field(idx), nulled)
            stats[f"{t}.{col}"] = {
                "rows": len(mask),
                "nulls": int(mask.sum()),
            }
        pq.write_table(tbl, f"{out_dir}/{t}.parquet")
        print(f"[gen_nulls] {t}: injected {cols}", flush=True)

    manifest = {
        "src": src,
        "seed": SEED,
        "null_rate": NULL_RATE,
        "generated_unix": int(time.time()),
        "nulls": stats,
    }
    with open(f"{out_dir}/MANIFEST.json", "w") as fh:
        json.dump(manifest, fh, indent=1)
    print(
        f"[gen_nulls] done in {time.time() - t0:.1f}s -> {out_dir}",
        flush=True,
    )


if __name__ == "__main__":
    main()
