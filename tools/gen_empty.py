"""Generate a ZERO-ROW twin of a testdata directory (schemas intact).

Round-13 correctness axis #3 (after volume sf0.1→sf3, Zipf skew, and
NULL injection): every table keeps its exact parquet schema but carries
zero rows. At 100 TB the realistic production shape this models is the
EMPTY SLICE — a partition-pruned scan that matches nothing, a tenant
with no data yet, a date hole, a filter that eliminates everything —
and operators meet it constantly. Classic failure modes this twin
exists to catch:

* ``.first()`` / ``head()`` on an empty stat frame → None deref;
* global aggregates: engines must agree that no-groupBy agg yields ONE
  row of NULLs/0 while grouped agg yields ZERO rows;
* division by a zero count / ln(0) in fixed-order float chains;
* iterative kernels (pagerank, BPE rounds, pointer doubling) whose
  fixpoint loop assumes a non-empty frontier;
* streaming drains whose foreachBatch sink table is never created
  because no batch ever fires, then the post-drain read fails;
* broadcast builds of "tiny" stat tables that are now 0-row.

Usage: python tools/gen_empty.py [out_dir] [src_dir]
Defaults: /root/repo/.emptydata  /root/testdata/sf0.01
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow.parquet as pq

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.emptydata"
    src_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        schema = pq.read_schema(src)
        pq.write_table(schema.empty_table(), os.path.join(out_dir, f"{t}.parquet"))
        print(f"{t}: 0 rows, {len(schema)} cols")
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(
            {"src": src_dir, "rows": 0, "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())},
            f,
            indent=2,
        )


if __name__ == "__main__":
    main()
