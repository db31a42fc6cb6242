"""Degenerate-catalog robustness: every query family must survive an
EMPTY catalog and a ONE-ROW catalog whose tables are Spark-written
parquet DIRECTORIES (the real lake layout, vs the single-file test
fixtures). This pins the fixes for:

- stream staging assuming events.parquet is a single FILE
  (stream_queries._stage_events_dir now stages part files from a
  directory; _stage_events_ordered degrades to one batch when the
  percentile cuts of an empty table come back NULL),
- the CoW snapshot's file-stat pruning KeyError on zero-row files and
  its zero-path read when the update predicate touches no file
  (snapshot.py: no-op v1 commit),
- UNABLE_TO_INFER_SCHEMA reading back a partitioned write of an empty
  frame (readers.read_parquet empty_schema fallback) and a manifest
  that pruned every file (roundtrip.q_manifest_pruned_scan),
- Observation.get crashing when a zero-file plan collapses to a
  LocalRelation and the observe node never runs (data_quality.py).

The full 336-query sweep over both catalogs was run out-of-band
(0 failures); the suite keeps the previously-failing set plus one
representative per family so the property stays cheap to check.
"""

from __future__ import annotations

import os

import pytest

from dateng_data_lakes_apache_spark_spark.registry import get_queries

#: Every query that failed the original sweep, plus one cheap
#: representative per batch family.
_COVERED = [
    # streaming (file-source staging + watermark replays)
    "q_stream_tumbling",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_sliding",
    "q_stream_static_join",
    "q_stream_custom_state",
    "q_stream_sink_parquet",
    "q_stream_stream_join",
    "q_stream_session_native",
    "q_stream_geo_hotspot",
    "q_stream_rate_alert",
    "q_stream_append",
    "q_stream_outer_join",
    "q_stream_transform_state",
    "q_stream_dedup_watermark",
    "q_stream_merge_upsert",
    "q_stream_full_outer",
    "q_stream_chained",
    "q_stream_restart",
    # lake / sources
    "q_partitioned_pruned",
    "q_join_dpp",
    "q_dynamic_overwrite",
    "q_manifest_pruned_scan",
    "q_snapshot_read",
    "q_observe_metrics",
    # one representative per batch family (never failed; regression floor)
    "q_agg_groupby",
    "q_join_inner_2key",
    "q_window_rank",
    "q_dedup_exact",
    "q_similarity_topk",
    "q_pagerank",
    "q_text_stats",
]

_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def degenerate_catalogs(spark, tmp_path_factory):
    """Empty and one-row catalogs with the REAL table schemas, written as
    Spark parquet directories (multi-file-capable layout)."""
    roots = {}
    for variant, n in [("empty", 0), ("one", 1)]:
        root = str(tmp_path_factory.mktemp(f"degcat_{variant}"))
        for t in _TABLES:
            (
                spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
                .limit(n)
                .write.mode("overwrite")
                .parquet(os.path.join(root, f"{t}.parquet"))
            )
        roots[variant] = root
    return roots


@pytest.mark.parametrize("variant", ["empty", "one"])
@pytest.mark.parametrize("name", _COVERED)
def test_query_survives_degenerate_catalog(
    spark, degenerate_catalogs, variant, name
):
    # No result assertion: the contract under test is "runs end-to-end
    # and returns a well-formed (possibly empty) frame" — values on
    # degenerate inputs are covered by the oracle/property suites where
    # they are defined.
    rows = get_queries()[name](spark, degenerate_catalogs[variant]).collect()
    assert isinstance(rows, list)
