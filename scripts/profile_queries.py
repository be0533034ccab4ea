"""Per-query profiler: wall time (min of N), Spark job/stage/task counts.

Usage: python scripts/profile_queries.py [N_RUNS] q1 q2 ...

For each query: runs it N times (min wall), and on the last run diffs the
AppStatusStore job list to report how many Spark jobs / stages / tasks the
single query execution issued — the fixed-cost fingerprint that dominates
bench time at sf0.1 (scale exponents ~0 for the expensive cohort).
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def job_stats(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    n = jobs.size()
    total_jobs = 0
    total_tasks = 0
    stage_ids = set()
    for i in range(n):
        j = jobs.apply(i)
        total_jobs += 1
        total_tasks += j.numTasks()
        sids = j.stageIds()
        for k in range(sids.size()):
            stage_ids.add(sids.apply(k))
    return total_jobs, len(stage_ids), total_tasks


def main() -> None:
    args = sys.argv[1:]
    n_runs = 2
    if args and args[0].isdigit():
        n_runs = int(args[0])
        args = args[1:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dataquality_ml_spark import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("dq-profile")
    spark.sparkContext.setLogLevel("OFF")
    qs = entry_mod.queries()

    print(f"{'query':42s} {'min_s':>7s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s}")
    for name in names:
        fn = qs[name]
        times = []
        jobs = stages = tasks = 0
        for r in range(n_runs):
            spark.catalog.clearCache()
            j0, s0, t0 = job_stats(spark)
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t_start = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t_start)
            j1, s1, t1 = job_stats(spark)
            jobs, stages, tasks = j1 - j0, s1 - s0, t1 - t0
        print(
            f"{name:42s} {min(times):7.2f} {jobs:5d} {stages:6d} {tasks:6d}"
            f"   runs={['%.2f' % t for t in times]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
