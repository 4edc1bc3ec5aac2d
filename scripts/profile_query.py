"""Per-job wall-time profile of one registry query (optimization round
instrumentation): runs the named query once through the noop sink with a
job-group label, then prints every Spark job that ran inside it with its
wall time and stage/task breakdown from the status tracker REST-free API.

Usage:
    python scripts/profile_query.py <query_name> [reps]

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spreadsheet_etl_engine_spark import registry  # noqa: E402
from spreadsheet_etl_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    fn = registry.get(name).fn
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    times = []
    last_rep_first_job = 0
    for rep in range(reps):
        # Bracket each rep by job id (r16 ADVICE fix: the wall-clock
        # cutoff heuristic could misattribute overlapping jobs).
        last_rep_first_job = max(tracker.getJobIdsForGroup(None) or [-1]) + 1
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        times.append(wall)
        print(f"rep {rep}: {wall:.3f}s")
    # Job-level attribution on the LAST rep via the app status store
    # (statusTracker lacks durations; use the REST API through the UI).
    ui = sc.uiWebUrl
    if ui:
        import urllib.request

        app_id = sc.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded") as r:
            jobs = json.loads(r.read())
        # jobs are newest-first; take those from the last rep window
        from datetime import datetime, timezone

        def ts(s):
            return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").replace(
                tzinfo=timezone.utc).timestamp()

        jobs.sort(key=lambda j: j["submissionTime"])
        total = sum(times) / len(times)
        print(f"\nmedian-ish mean: {total:.3f}s;  last-rep jobs:")
        shown = [j for j in jobs if j["jobId"] >= last_rep_first_job]
        for j in shown:
            dur = ts(j["completionTime"]) - ts(j["submissionTime"])
            desc = (j.get("description") or j.get("name") or "")[:90]
            print(f"  job {j['jobId']:>4}  {dur*1000:7.0f} ms  "
                  f"tasks={j['numCompletedTasks']:<4} {desc}")
        print(f"  ({len(shown)} jobs in last rep)")


if __name__ == "__main__":
    main()
