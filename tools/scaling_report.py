"""Compute the sf0.1 -> sf1 per-key scaling curve from two bench
detail files (VERDICT r08 item 2).

Reads two `bench_samples.json`-format artifacts (written by bench.py
via $BENCH_DETAIL_PATH), joins per-key min timings, and emits a JSON
report with the time ratio per key plus a flagged list: with 10x rows,
a healthy distributed plan scales at ~linear x log — keys above the
flag threshold get a fix or a documented bound in SCALE.md.

The threshold defaults to 13x (10x data x log-ish headroom for extra
shuffle waves at fixed parallelism); sub-second sf0.1 keys are judged
against an absolute floor instead (fixed per-query overhead — session,
planning, file listing — dominates tiny keys and a ratio there is
constant-cost noise, not a scaling signal).

Usage:
    python tools/scaling_report.py SMALL.json BIG.json [OUT.json]
"""
from __future__ import annotations

import json
import sys

RATIO_FLAG = 13.0
SMALL_FLOOR_SEC = 1.0   # keys faster than this at the small sf ...
ABS_FLOOR_SEC = 20.0    # ... are only flagged above this at the big sf


def main() -> None:
    small_path, big_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "SCALING_REPORT.json"
    small = json.load(open(small_path))
    big = json.load(open(big_path))

    def keymap(d):
        m = dict(d.get("queries", {}))
        m.update(d.get("extra_bench_only", {}))
        return m

    qs, qb = keymap(small), keymap(big)
    shared = sorted(set(qs) & set(qb))
    rows = {}
    flagged = {}
    for k in shared:
        ratio = round(qb[k] / qs[k], 2) if qs[k] > 0 else None
        rows[k] = {"small": qs[k], "big": qb[k], "ratio": ratio}
        if qs[k] >= SMALL_FLOOR_SEC:
            if ratio is not None and ratio > RATIO_FLAG:
                flagged[k] = rows[k]
        elif qb[k] > ABS_FLOOR_SEC:
            flagged[k] = rows[k]
    report = {
        "small_sf": small.get("sf"),
        "big_sf": big.get("sf"),
        "small_total_sec": small.get("value"),
        "big_total_sec": big.get("value"),
        "total_ratio": (
            round(big["value"] / small["value"], 2)
            if small.get("value") else None
        ),
        "n_shared_keys": len(shared),
        "ratio_flag_threshold": RATIO_FLAG,
        "flagged": flagged,
        "missing_in_big": sorted(set(qs) - set(qb)),
        "missing_in_small": sorted(set(qb) - set(qs)),
        "errors_big": big.get("errors", {}),
        "loadavg_small": small.get("loadavg_start"),
        "loadavg_big": big.get("loadavg_start"),
        "keys": rows,
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=False)
    print(
        json.dumps(
            {
                "total_ratio": report["total_ratio"],
                "n_flagged": len(flagged),
                "flagged": sorted(flagged),
                "out": out_path,
            }
        )
    )


if __name__ == "__main__":
    main()
