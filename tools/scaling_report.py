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
    python tools/scaling_report.py SMALL.json MID.json BIG.json OUT.json

Three-file mode fits a per-key log-log slope across the three scale
points (t ~ sf^alpha): alpha <= ~1.15 is linear-with-log headroom,
and the fit residual separates "genuinely superlinear" from "one
noisy point" in a way a single pairwise ratio cannot.
"""
from __future__ import annotations

import json
import sys

RATIO_FLAG = 13.0
SMALL_FLOOR_SEC = 1.0   # keys faster than this at the small sf ...
ABS_FLOOR_SEC = 20.0    # ... are only flagged above this at the big sf


def main() -> None:
    if len(sys.argv) >= 5:
        three_point(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4])
        return
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




# slope above which a key is flagged in three-point mode: t ~ sf^1.3
# means a 100 TB run pays ~4x the linear cost — worth a named bound
SLOPE_FLAG = 1.3


def three_point(p1: str, p2: str, p3: str, out_path: str) -> None:
    """Fit t(sf) ~ c * sf^alpha per key over three measured points by
    least squares in log-log space; flag keys whose alpha exceeds
    SLOPE_FLAG (small-sf keys below the timing floor are skipped the
    same way pairwise mode skips them)."""
    import math

    arts = [json.load(open(p)) for p in (p1, p2, p3)]
    sfs = [a.get("sf") for a in arts]

    def keymap(d):
        m = dict(d.get("queries", {}))
        m.update(d.get("extra_bench_only", {}))
        return m

    maps = [keymap(a) for a in arts]
    shared = sorted(set(maps[0]) & set(maps[1]) & set(maps[2]))
    xs = [math.log(s) for s in sfs]
    xbar = sum(xs) / 3.0
    xvar = sum((x - xbar) ** 2 for x in xs)
    rows, flagged = {}, {}
    for k in shared:
        ts = [m[k] for m in maps]
        ys = [math.log(t) for t in ts]
        ybar = sum(ys) / 3.0
        alpha = sum((x - xbar) * (y - ybar)
                    for x, y in zip(xs, ys)) / xvar
        # residual of the middle point vs the 2-point endpoints line:
        # large => the "slope" is really one noisy measurement
        endpoint_alpha = (ys[2] - ys[0]) / (xs[2] - xs[0])
        mid_pred = ys[0] + endpoint_alpha * (xs[1] - xs[0])
        resid = ys[1] - mid_pred
        rows[k] = {
            "t": ts,
            "alpha": round(alpha, 3),
            "mid_resid_log": round(resid, 3),
        }
        if ts[0] >= SMALL_FLOOR_SEC and alpha > SLOPE_FLAG:
            flagged[k] = rows[k]
        elif ts[0] < SMALL_FLOOR_SEC and ts[2] > ABS_FLOOR_SEC:
            flagged[k] = rows[k]
    report = {
        "sfs": sfs,
        "totals_sec": [a.get("value") for a in arts],
        "total_alpha": round(
            (math.log(arts[2]["value"]) - math.log(arts[0]["value"]))
            / (xs[2] - xs[0]), 3),
        "n_shared_keys": len(shared),
        "slope_flag_threshold": SLOPE_FLAG,
        "flagged": flagged,
        "missing_somewhere": sorted(
            (set(maps[0]) | set(maps[1]) | set(maps[2])) - set(shared)),
        "loadavgs": [a.get("loadavg_start") for a in arts],
        "keys": rows,
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=False)
    print(json.dumps({
        "total_alpha": report["total_alpha"],
        "n_flagged": len(flagged),
        "flagged": sorted(flagged),
        "out": out_path,
    }))


if __name__ == "__main__":
    main()
