"""Generate a Zipf-skewed twin of the sf1 bench dataset.

VERDICT r09 item 7: the sf0.1→sf1 curve measures volume scaling on
near-uniform keys, which never exercises the skew machinery
(`plans/skew.py` salting, AQE skew-join splitting, per-key state on a
hot user). This script rewrites the sf1 FK columns through seeded Zipf
draws so the hot-key pathologies a 100 TB power-law workload hits are
actually present:

- ``events.user_id``     → Zipf over the user domain (one user owns
  ~18% of all events at a=1.2: hot sessionize/user-window/stream-state
  key).
- ``lineitem.l_partkey`` / ``l_suppkey`` → Zipf over part/supplier
  domains (hot join + GROUP BY keys for the TPC-H family).
- ``orders.o_custkey``   → Zipf over the customer domain (hot customer
  for q13/q18/q22 shapes).

Primary keys and all other columns are untouched, so every FK still
resolves against the same dims and all oracles remain valid — the
correctness harness runs against this directory unchanged (the point:
value-check skew-sensitive keys ON skewed data, not just time them).
region/nation/customer/supplier/part/documents/embeddings are copied
verbatim from the sf1 source.

Deterministic (fixed seed). Output defaults to /root/repo/.skewdata
(gitignored, like .sf1data).

Usage: python tools/gen_skew.py [out_dir] [src_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260815
ZIPF_A = 1.2

# table -> list of (fk_column, domain_table, domain_pk)
REMAP = {
    "events": [("user_id", "events", "user_id")],
    "lineitem": [
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
    "orders": [("o_custkey", "customer", "c_custkey")],
}

COPY_VERBATIM = (
    "region", "nation", "customer", "supplier", "part",
    "documents", "embeddings",
)


def _zipf_keys(rng: np.random.Generator, n: int, domain: int) -> np.ndarray:
    """n Zipf(ZIPF_A) draws folded onto [0, domain): value k gets mass
    ~ (k+1)^-a, so key 0 is the hottest (~1/zeta(a) of all rows)."""
    z = rng.zipf(ZIPF_A, size=n)
    return ((z - 1) % domain).astype(np.int64)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.skewdata"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.sf1data"
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    con = duckdb.connect()
    rng = np.random.default_rng(SEED)

    for t in COPY_VERBATIM:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out_dir}/{t}.parquet")

    stats: dict[str, dict] = {}
    for t, remaps in REMAP.items():
        tbl = pq.read_table(f"{src}/{t}.parquet")
        n = tbl.num_rows
        for col, dom_table, dom_pk in remaps:
            domain = con.execute(
                f"SELECT max({dom_pk}) + 1 FROM "
                f"read_parquet('{src}/{dom_table}.parquet')"
            ).fetchone()[0]
            keys = _zipf_keys(rng, n, int(domain))
            idx = tbl.schema.get_field_index(col)
            tbl = tbl.set_column(
                idx, tbl.schema.field(idx), pa.array(keys, pa.int64())
            )
            top = np.bincount(keys, minlength=1)[:1][0] if len(keys) else 0
            stats[f"{t}.{col}"] = {
                "rows": n,
                "domain": int(domain),
                "hottest_key_rows": int(top),
                "hottest_share": round(float(top) / n, 4),
            }
        pq.write_table(tbl, f"{out_dir}/{t}.parquet")
        print(f"[gen_skew] {t}: {n} rows, remapped "
              f"{[c for c, _, _ in remaps]}", flush=True)

    manifest = {
        "src": src,
        "seed": SEED,
        "zipf_a": ZIPF_A,
        "generated_unix": int(time.time()),
        "skew": stats,
    }
    with open(f"{out_dir}/MANIFEST.json", "w") as fh:
        json.dump(manifest, fh, indent=1)
    print(f"[gen_skew] done in {time.time() - t0:.1f}s -> {out_dir}",
          flush=True)
    print(json.dumps(stats, indent=1))


if __name__ == "__main__":
    main()
