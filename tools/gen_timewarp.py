"""Generate a time-pathology twin of a testdata directory.

Round-14 correctness axis #7 (after volume, skew, NULLs, zero rows,
unicode, payload size): the base generators emit well-behaved 2024-ish
UTC timestamps, so every sweep has been blind to the temporal places
engines can diverge — year/century boundaries, leap days (including
the 2000 leap-century and 2100 non-leap-century), the 1582 Gregorian
reform straddle under proleptic-Gregorian arithmetic, pre-epoch
(negative-epoch-day) instants, microsecond-precision extremes
(``...999999``), sub-second rounding in formatting, and the DST
transition instants where any accidental non-UTC session-timezone
application (Spark ``spark.sql.session.timeZone`` vs DuckDB
``TimeZone``) would first show.

The warp is seeded and row-deterministic (a pure function of the
row's primary key and column name, NOT of row order), so both engines
see the exact same timestamps and every oracle remains a valid twin.
~10% of values per temporal column are remapped onto a pathology pool;
the rest stay verbatim as a control group.

Range policy (measured constraints, not taste):

* ``orders.o_orderdate`` / ``lineitem.l_shipdate`` get the FULL pool
  (year 0001..2199) — no batch operator routes these through pandas,
  and both engines use proleptic-Gregorian ``timestamp[us]``.
* ``events.ts`` is clamped to (epoch, 2199]: two measured engine
  boundaries. Ceiling — the streaming sessionizer
  (``applyInPandasWithState``) moves event times through pandas, whose
  ``datetime64[ns]`` only spans 1677-09-21..2262-04-11, and the
  sentinel-flush sources add up to 14 days to ``max(ts)``; 2199 keeps
  a >60-year margin. Floor — Spark Structured Streaming initializes
  the watermark to epoch-0 ms, and every watermarked stateful operator
  drops rows whose event time is ≤ the current watermark, so events at
  or before 1970-01-01T00:00:00Z are silently discarded in the very
  first micro-batch (measured: a 4-row dedup drain kept only the
  post-epoch row; pinned in tests/test_streaming.py). Batch operators
  handle pre-epoch timestamps fine — orders/lineitem keep them.

Usage: python tools/gen_timewarp.py [out_dir] [src_dir]
Defaults: /root/repo/.timewarpdata  /root/testdata/sf0.01
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260816
WARP_RATE = 10  # 1-in-N values per temporal column

_F = "%Y-%m-%d %H:%M:%S.%f"

# The pathology pool. Every instant is a plain (naive/UTC) timestamp —
# the DST entries are the UTC instants of the 2024 US/EU transitions,
# inert under correct UTC handling and loud under any accidental
# local-zone application.
POOL_FULL = [
    "0001-01-03 00:00:00.000000",  # proleptic deep past
    "1400-06-07 12:34:56.789012",  # pre-Gregorian-reform, odd micros
    "1582-10-04 23:59:59.999999",  # last Julian day (reform straddle)
    "1582-10-15 00:00:00.000000",  # first Gregorian day
    "1899-12-31 23:59:59.500000",  # century boundary, .5s rounding bait
    "1969-12-31 23:59:59.999999",  # epoch minus 1 microsecond
    "1970-01-01 00:00:00.000000",  # the epoch
    "1970-01-01 00:00:00.000001",  # epoch plus 1 microsecond
    "2000-02-29 12:00:00.000000",  # leap-century day (divisible by 400)
    "2023-12-31 23:59:59.999999",  # year boundary, final microsecond
    "2024-01-01 00:00:00.000000",  # year boundary
    "2024-02-29 23:59:59.999999",  # leap day, final microsecond
    "2024-03-10 06:59:59.999999",  # US spring-forward instant (UTC)
    "2024-03-10 07:00:00.000000",
    "2024-03-31 01:30:00.000000",  # EU spring-forward gap hour (UTC)
    "2024-10-27 00:59:59.999999",  # EU fall-back ambiguous hour (UTC)
    "2024-11-03 05:30:00.000000",  # US fall-back repeated hour (UTC)
    "2100-02-28 23:59:59.000000",  # non-leap century (div 100, not 400)
    "2199-12-31 23:59:59.999999",  # far future, inside pandas-ns range
]
# strictly AFTER the epoch (watermark floor) and within pandas-ns range
_STREAM_SAFE_FLOOR = "1970-01-01 00:00:00.000001"
POOL_EVENTS = [s for s in POOL_FULL if s >= _STREAM_SAFE_FLOOR]

# table -> (pk column used to derive the mask, {ts column: pool})
INJECT = {
    "orders": ("o_orderkey", {"o_orderdate": POOL_FULL}),
    "lineitem": ("l_orderkey", {"l_shipdate": POOL_FULL}),
    "events": ("event_id", {"ts": POOL_EVENTS}),
}

COPY_VERBATIM = (
    "region", "nation", "customer", "supplier", "part", "documents",
    "embeddings",
)


def _h(pk, col: str, tag: str) -> int:
    return int(
        hashlib.md5(f"{SEED}|{pk}|{col}|{tag}".encode()).hexdigest()[:12],
        16,
    )


def warp_column(pks: list, vals: list, col: str, pool: list[str]):
    out = []
    n_warped = 0
    parsed = [datetime.strptime(s, _F) for s in pool]
    for pk, v in zip(pks, vals):
        if v is not None and _h(pk, col, "warp") % WARP_RATE == 0:
            out.append(parsed[_h(pk, col, "pick") % len(parsed)])
            n_warped += 1
        else:
            out.append(v)
    return out, n_warped


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.timewarpdata"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    for t in COPY_VERBATIM:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out_dir}/{t}.parquet")

    counts = {}
    for t, (pk_col, cols) in INJECT.items():
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pks = tbl.column(pk_col).to_pylist()
        for col, pool in cols.items():
            idx = tbl.schema.get_field_index(col)
            vals = tbl.column(col).to_pylist()
            new_vals, n = warp_column(pks, vals, col, pool)
            tbl = tbl.set_column(
                idx,
                tbl.schema.field(idx),
                pa.array(new_vals, type=tbl.schema.field(idx).type),
            )
            counts[f"{t}.{col}"] = {"rows": len(vals), "warped": n}
        pq.write_table(tbl, f"{out_dir}/{t}.parquet")

    manifest = {
        "src": src,
        "seed": SEED,
        "warp_rate": f"1/{WARP_RATE}",
        "pool_full": POOL_FULL,
        "pool_events": POOL_EVENTS,
        "columns": counts,
        "generated_unix": int(time.time()),
    }
    with open(f"{out_dir}/MANIFEST.json", "w") as fh:
        json.dump(manifest, fh, indent=1)
    print(
        "[gen_timewarp] "
        + ", ".join(f"{k}: {v['warped']}/{v['rows']}" for k, v in counts.items())
        + f" in {time.time() - t0:.1f}s -> {out_dir}",
        flush=True,
    )


if __name__ == "__main__":
    main()
