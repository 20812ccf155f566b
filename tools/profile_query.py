"""Profile one registered query: run it through the noop sink with the
Spark UI enabled, then dump per-stage metrics (duration, task time,
shuffle read/write, input bytes, Python/GC time) from the UI REST API —
the guide's §7.1 empirical loop, scripted.

Usage: python tools/profile_query.py [--sf-dir DIR] [--iters N] name
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_spark.plans.transient import release_transient
from map_reduce_spark.registry import load_all
from map_reduce_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("name")
    args = ap.parse_args()

    specs = load_all()
    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})

    def execute(df) -> None:
        df.write.format("noop").mode("overwrite").save()
        release_transient()

    execute(specs["q6_forecast_revenue"].builder(spark, args.sf_dir))

    # run the target; first run warms, the last run is profiled
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        mark_jobs_from = json.loads(
            urllib.request.urlopen(
                "http://localhost:4040/api/v1/applications"
            ).read()
        )[0]["id"]
        spark.sparkContext.setJobGroup(f"iter{i}", args.name)
        execute(specs[args.name].builder(spark, args.sf_dir))
        times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobGroup(None, None)

    app = json.loads(
        urllib.request.urlopen("http://localhost:4040/api/v1/applications").read()
    )[0]["id"]
    jobs = json.loads(
        urllib.request.urlopen(
            f"http://localhost:4040/api/v1/applications/{app}/jobs"
        ).read()
    )
    last_iter = f"iter{args.iters - 1}"
    jobs = [j for j in jobs if j.get("jobGroup") == last_iter]
    print(f"query={args.name} iters={times}")
    print(f"jobs in last iter: {len(jobs)}")
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    rows = []
    for sid in stage_ids:
        try:
            st = json.loads(
                urllib.request.urlopen(
                    f"http://localhost:4040/api/v1/applications/{app}/stages/{sid}"
                ).read()
            )[0]
        except Exception:
            continue
        if st["status"] == "SKIPPED":
            continue
        dur = (st.get("executorRunTime") or 0) / 1000.0
        rows.append(
            (
                sid,
                st["name"].split("\n")[0][:60],
                st["numCompleteTasks"],
                round(dur, 2),
                round((st.get("executorCpuTime") or 0) / 1e9, 2),
                round((st.get("jvmGcTime") or 0) / 1000.0, 2),
                st.get("inputBytes", 0) // 1024,
                st.get("shuffleReadBytes", 0) // 1024,
                st.get("shuffleWriteBytes", 0) // 1024,
                round((st.get("firstTaskLaunchedTime") is not None) and 0 or 0, 2),
            )
        )
    rows.sort(key=lambda r: -r[3])
    print(
        f"{'sid':>5} {'tasks':>5} {'run_s':>7} {'cpu_s':>7} {'gc_s':>5} "
        f"{'in_KB':>8} {'shR_KB':>8} {'shW_KB':>8}  name"
    )
    for r in rows[:25]:
        print(
            f"{r[0]:>5} {r[2]:>5} {r[3]:>7} {r[4]:>7} {r[5]:>5} "
            f"{r[6]:>8} {r[7]:>8} {r[8]:>8}  {r[1]}"
        )
    total_run = sum(r[3] for r in rows)
    print(f"sum executorRunTime over stages: {round(total_run,2)} s "
          f"(wall {times[-1]} s x 32 cores = {round(times[-1]*32,1)} core-s)")
    # job-level wall timeline to expose driver-side gaps
    print("\njob timeline (last iter):")
    for j in sorted(jobs, key=lambda j: j["jobId"]):
        t0 = j.get("submissionTime", "")
        t1 = j.get("completionTime", "")
        print(f"  job {j['jobId']:>4} {j['status']:<9} {t0[11:23]} -> {t1[11:23]} stages={j['stageIds']}")


if __name__ == "__main__":
    main()
