"""A/B probe for q_cogroup_reconcile's Arrow-crossing constant (VERDICT
r9 stretch item 8).

The r9 10x sweep measured q_cogroup_reconcile at 0.57 per-unit cost —
near-linear, the highest slope among the probed heavyweights. The
kernel itself is vectorized; the suspected floor is per-GROUP overhead:
``cogroup().applyInPandas`` makes one Python call per key with a
~10-row frame pair, so the wall-clock is dominated by (a) Arrow batch
framing per group and (b) per-task Python-worker setup amortized over
groups-per-partition.

This probe times the registered builder at sf0.1 and the synthetic 10x
(.scratch/sfsweep/sf1x, from tools/sf1_sweep.py --gen-only) across:
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` in {1k, 10k(default), 100k}
  — controls how many INPUT rows ride per Arrow batch on the way into
  the Python worker (output frames are 1-row regardless);
- ``spark.sql.shuffle.partitions`` in {8, 32, 128} — fewer partitions =
  more groups per Python worker, amortizing worker spin-up, at the
  price of less parallelism.

Median of 3 runs per cell, fresh noop-sink execution, caches cleared
between runs (same discipline as bench.py). Results land in
BASELINE.md's scaling section by hand.

Usage: python tools/cogroup_batch_probe.py
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dateng_data_lakes_apache_spark_spark.caching import release_caches
from dateng_data_lakes_apache_spark_spark.registry import get_queries
from dateng_data_lakes_apache_spark_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1X = os.path.join(REPO, ".scratch", "sfsweep", "sf1x")
REPEATS = 3


def main() -> None:
    spark = get_spark(app_name="cogroup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    fn = get_queries()["q_cogroup_reconcile"]
    # warm the JVM + Python-worker pool once
    fn(spark, SF01).write.format("noop").mode("overwrite").save()

    datasets = [("sf0.1", SF01)]
    if os.path.isdir(SF1X):
        datasets.append(("sf1x", SF1X))
    print(f"{'data':6} {'batch':>7} {'parts':>6} {'median_s':>9} {'spread':>7}")
    for tag, sf_dir in datasets:
        for batch in (1_000, 10_000, 100_000):
            for parts in (8, 32, 128):
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch)
                )
                spark.conf.set("spark.sql.shuffle.partitions", str(parts))
                ts = []
                for _ in range(REPEATS):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                    ts.append(time.perf_counter() - t0)
                    release_caches()
                    spark.catalog.clearCache()
                    gc.collect()
                print(
                    f"{tag:6} {batch:>7} {parts:>6} "
                    f"{statistics.median(ts):>9.2f} {max(ts) - min(ts):>7.2f}",
                    flush=True,
                )
    spark.stop()


if __name__ == "__main__":
    main()
