"""Executed-plan snapshot artifacts (VERDICT r3 item 7).

tests/test_plans.py asserts ~60 individual plan PROPERTIES; this module
additionally pins the WHOLE physical plan of the headline queries as
committed text artifacts (``PLANS_r4/``), so any plan change — an
optimizer regression, a lost pushdown, a join strategy flip — shows up
as a reviewable git diff rather than only a failed property assert.

``normalized_plan`` strips the run-varying parts (expression ids,
in-memory relation hashes, scratch-path UUIDs) and keeps everything
structural: node tree, join strategies, partitioning, PushedFilters,
ReadSchema. Regenerate with::

    python -m dateng_data_lakes_apache_spark_spark.plans.snapshot

and the round-trip test (tests/test_plan_snapshots.py) fails if the
committed artifacts no longer match what the engine plans today.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame

from .explain import formatted_plan

#: The headline set whose full plans are pinned: the round-1 driver
#: bench queries (minus the streaming one, whose registered output is a
#: memory-sink scan with no plan to pin) plus the MAD heavyweight.
SNAPSHOT_QUERIES = [
    "q_scan_project",
    "q_filter_range",
    "q_agg_groupby",
    # (q_agg_distinct excluded: its count-distinct EXPAND rewrite orders
    # the grouping columns nondeterministically across sessions — the
    # equivalent plan PROPERTIES are asserted in tests/test_plans.py)
    "q_having",
    "q_join_inner_2key",
    "q_join_left",
    "q_join_broadcast",
    "q_join_theta_range",
    "q_window_topk_per_group",
    "q_window_running",
    "q_sort_limit",
    "q_explode_wordcount",
    "q_text_quality",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_doc_fingerprint",
    "q_vector_norm",
    "q_similarity_topk",
    "q_star_etl",
    "q_mad_outlier",
]

SNAPSHOT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "PLANS_r4",
)

#: Driver correctness scale — plans are size-sensitive (broadcast
#: thresholds), so the snapshot pins the sf the driver gates on.
SNAPSHOT_SF_DIR = "/root/testdata/sf0.01"

#: Plans are also CONF-sensitive (partition counts in Exchange specs,
#: spread() gating on defaultParallelism), so snapshots pin the test
#: session's config; the __main__ regenerator creates exactly this.
SNAPSHOT_SESSION = dict(app_name="plan-snapshots", master="local[4]", shuffle_partitions=4)


def normalized_plan(df: DataFrame) -> str:
    """Formatted plan with run-varying tokens canonicalized."""
    text = formatted_plan(df)
    # expression ids (#123, #123L) vary with builder invocation order
    text = re.sub(r"#\d+", "#_", text)
    # plan_id is a session-global counter — position-dependent, not structural
    text = re.sub(r"\[plan_id=\d+\]", "[plan_id=_]", text)
    # HOF lambda variable names (x_24, y_47, ...) carry a session-global
    # counter too; single-letter_digits never collides with column names
    text = re.sub(r"\b([a-z])_\d+", r"\1_", text)
    # cached-relation / rdd identity hashes
    text = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[_]", text)
    text = re.sub(r"\bcachedPlan=\S+", "cachedPlan=_", text)
    # scratch staging uses per-run uuids in some writers
    text = re.sub(r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}", "_uuid_", text)
    # drop fully volatile lines (free-memory sizes etc. if present)
    lines = [ln.rstrip() for ln in text.splitlines()]
    return "\n".join(lines).rstrip() + "\n"


def generate(spark, sf_dir: str = SNAPSHOT_SF_DIR) -> dict[str, str]:
    """(name → normalized plan text) for every snapshot query."""
    from ..caching import release_caches
    from ..registry import get_queries

    # Plans are cache-state-sensitive (a pre-materialized index swaps a
    # scan subtree for InMemoryTableScan); snapshot from a clean slate.
    release_caches()
    spark.catalog.clearCache()
    qs = get_queries()
    return {name: normalized_plan(qs[name](spark, sf_dir)) for name in SNAPSHOT_QUERIES}


def write_snapshots(spark, out_dir: str = SNAPSHOT_DIR, sf_dir: str = SNAPSHOT_SF_DIR) -> int:
    os.makedirs(out_dir, exist_ok=True)
    plans = generate(spark, sf_dir)
    for name, text in plans.items():
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(text)
    return len(plans)


if __name__ == "__main__":
    from ..session import get_spark

    n = write_snapshots(get_spark(**SNAPSHOT_SESSION))
    print(f"wrote {n} plan snapshots to {SNAPSHOT_DIR}")
