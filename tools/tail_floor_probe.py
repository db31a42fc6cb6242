"""Tail-floor decomposition probe (r12, VERDICT r11 item 8).

Quantifies the per-query floor that dominates the ~170-query <=1 s tail,
split into its mechanical components, for 3 representative tail queries:

- q_scan_project     (scan + narrow projection: pure I/O path)
- q_sort_limit       (global sort + limit: one wide exchange)
- q_explode_wordcount(explode + groupBy agg: generator + partial agg)

Components measured per query, in one session (bench.py env contract:
$SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS):

  build_s      Python DSL -> unresolved plan (pure driver Python)
  plan_s       catalyst analyze+optimize+physical planning (executedPlan,
               forced without running a job)
  first_s      first noop-sink run (includes whole-stage codegen compile
               for this plan shape + first-touch scheduling)
  warm_s       median of N subsequent noop runs (steady state: task
               scheduling + AQE re-planning + actual compute)
  aqe_off_s    warm median with spark.sql.adaptive.enabled=false
               (isolates AQE re-optimization overhead; restored after)
  sched_s      empty-work RDD job with the same task count as the query's
               first stage (pure scheduler round-trip floor)
  sink_s       noop write of a pre-materialized 1-row local DF (job-launch
               + sink floor, no compute)

Session floors measured once: JVM+session startup, first-ever job.
Run with SPARK_GRAFT_CPUS=32 and =8 in fresh processes; outputs one JSON
line per run for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dateng_data_lakes_apache_spark_spark.registry import get_queries
from dateng_data_lakes_apache_spark_spark.session import get_spark

QUERIES = ["q_scan_project", "q_sort_limit", "q_explode_wordcount"]
REPEATS = 5


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    t0 = time.perf_counter()
    spark = get_spark(app_name="tail_floor_probe")
    session_s = time.perf_counter() - t0
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    spark.range(1).count()
    first_job_s = time.perf_counter() - t0

    queries = get_queries()
    # bench.py warmup: scan path touched once so query 1 isn't charged it.
    noop(queries["q_scan_project"](spark, sf_dir).limit(1))

    out = {
        "cpus": int(cpus),
        "sf_dir": sf_dir,
        "session_s": round(session_s, 3),
        "first_job_s": round(first_job_s, 3),
        "queries": {},
    }

    for name in QUERIES:
        fn = queries[name]

        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        build_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        plan_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        noop(df)
        first_s = time.perf_counter() - t0

        warms = []
        for _ in range(REPEATS):
            d = fn(spark, sf_dir)
            t0 = time.perf_counter()
            noop(d)
            warms.append(time.perf_counter() - t0)
        warm_s = statistics.median(warms)

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        aqe_off = []
        for _ in range(REPEATS):
            d = fn(spark, sf_dir)
            t0 = time.perf_counter()
            noop(d)
            aqe_off.append(time.perf_counter() - t0)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        aqe_off_s = statistics.median(aqe_off)

        # Scheduler floor at the query's own first-stage task count.
        n_tasks = df.rdd.getNumPartitions()
        scheds = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            spark.sparkContext.parallelize(range(n_tasks), n_tasks).count()
            scheds.append(time.perf_counter() - t0)
        sched_s = statistics.median(scheds)

        tiny = spark.createDataFrame([(1,)], "x int")
        sinks = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            noop(tiny)
            sinks.append(time.perf_counter() - t0)
        sink_s = statistics.median(sinks)

        out["queries"][name] = {
            "build_s": round(build_s, 3),
            "plan_s": round(plan_s, 3),
            "first_s": round(first_s, 3),
            "warm_s": round(warm_s, 3),
            "aqe_off_s": round(aqe_off_s, 3),
            "n_tasks_stage1": n_tasks,
            "sched_s": round(sched_s, 3),
            "sink_s": round(sink_s, 3),
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
