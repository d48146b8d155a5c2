"""Per-key job/stage profile: run one registry key with the bench's
noop-sink methodology and dump every Spark job it scheduled (duration,
stage breakdown, shuffle bytes) from the local REST API — the guide §1
"where does the time actually go" loop without a browser UI.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_key.py key1 [key2 ...]
"""

from __future__ import annotations

import calendar
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata1_spark import registry  # noqa: E402
from bigdata1_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def main() -> None:
    keys = sys.argv[1:]
    spark = get_spark(app_name="bigdata1-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM/footers
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()
    for key in keys:
        fn = getattr(registry.QUERIES[key], "__wrapped__", registry.QUERIES[key])
        spark.catalog.clearCache()
        # warm run (cache population parity with bench min-of-3)
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        jobs_before = {j["jobId"] for j in _rest(spark, "/jobs")}
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        jobs = [j for j in _rest(spark, "/jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {key}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        tot = 0.0

        def _epoch(ts: str) -> float:
            # "2026-08-18T05:41:02.123GMT" — GMT timestamps, parsed as
            # UTC (calendar.timegm; time.mktime would apply the local
            # zone) with the fractional part taken from the string tail
            # rather than a fixed slice (ADVICE r15).
            base, _, rest = ts.partition(".")
            frac = rest.rstrip("GMT")
            return calendar.timegm(
                time.strptime(base, "%Y-%m-%dT%H:%M:%S")
            ) + (float(f"0.{frac}") if frac else 0.0)

        for j in jobs:
            if "completionTime" not in j:  # still running: no duration
                desc = (j.get("description") or j.get("name") or "")[:90]
                print(f"  job {j['jobId']:>4} RUNNING  {desc}")
                continue
            dur = _epoch(j["completionTime"]) - _epoch(j["submissionTime"])
            tot += dur
            desc = (j.get("description") or j.get("name") or "")[:90]
            print(
                f"  job {j['jobId']:>4} {dur:7.3f}s stages={j['numCompletedStages']:>3} "
                f"tasks={j['numCompletedTasks']:>4}  {desc}"
            )
        print(f"  sum-of-jobs {tot:.3f}s (gaps/driver = {wall - tot:.3f}s)")


if __name__ == "__main__":
    main()
