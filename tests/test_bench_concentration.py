"""Bench concentration gate (r14 VERDICT task 7): no single registry
key may own more than BENCH_MAX_SHARE of the whole bench sweep.

The r14 lesson: link_prediction's exact triangle pass grew to 20% of
the sweep total at BOTH sf0.1 and sf1 before a human noticed it in a
bench JSON — a blow-up of that class should fail a test instead of
landing silently. The gate reads the newest bench detail artifact
(``bench_samples.json``, written by every bench.py run via
$BENCH_DETAIL_PATH) and asserts the per-key share of the sweep.

Skips when no artifact exists (fresh clone) — the gate is for trees
where a bench has actually run; the driver runs bench.py every round,
so the artifact exists whenever it matters. Keys with a justified
structural reason to be heavy go in WAIVERS with the reason string —
currently empty, which is the point.
"""
from __future__ import annotations

import json
import os

import pytest

BENCH_MAX_SHARE = 0.05
# key -> reason; a waiver documents a key whose cost is the honest
# price of its contract (e.g. a fixed streaming-restart floor on a
# tiny sweep), not a scaling defect.
WAIVERS: dict[str, str] = {}

_PATH = os.environ.get(
    "BENCH_GATE_PATH",
    os.path.join(os.path.dirname(os.path.dirname(__file__)),
                 "bench_samples.json"),
)


def test_no_key_dominates_bench():
    if not os.path.exists(_PATH):
        pytest.skip(f"no bench detail artifact at {_PATH}")
    with open(_PATH) as f:
        detail = json.load(f)
    queries = dict(detail.get("queries") or {})
    queries.update(detail.get("extra_bench_only") or {})
    total = sum(queries.values())
    if total < 30.0 or len(queries) < 50:
        pytest.skip(
            f"artifact too small to gate ({len(queries)} keys, "
            f"{total:.1f}s total)"
        )
    over = {
        k: (v, v / total)
        for k, v in queries.items()
        if v / total > BENCH_MAX_SHARE and k not in WAIVERS
    }
    assert not over, (
        "keys exceeding the "
        f"{BENCH_MAX_SHARE:.0%} bench-share gate (waiver with reason or "
        "fix the plan): "
        + ", ".join(
            f"{k}={v:.1f}s ({s:.1%})" for k, (v, s) in sorted(over.items())
        )
    )
