"""End-to-end test of the generalized star-schema pipeline against the
reference's bundled data, asserting the golden facts of SURVEY §5.2:

- 8,056 raw log events across 30 NDJSON files
- 6,820 of them are page='NextSong'
- 71 song records
- exactly 1 songplays join match ("Setanta matins" / Elena / userId 15)

This is the "queries given by the analytics team" golden-output test the
reference promised but never materialized (SURVEY §5.1).
"""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F

from dateng_data_lakes_apache_spark_spark.pipelines import star_schema as ss

REF_DATA = "/root/reference/data"
from dateng_data_lakes_apache_spark_spark.scratch import SCRATCH  # run-ID-keyed (r9)


@pytest.fixture(scope="module")
def staged_paths():
    """Extract the reference zips into scratch (read-only source, local stage)."""
    stage = os.path.join(SCRATCH, "reference_data")
    log_dir = os.path.join(stage, "log_data")
    song_dir = os.path.join(stage, "song_data")
    if not os.path.exists(os.path.join(stage, ".done")):
        os.makedirs(log_dir, exist_ok=True)
        with zipfile.ZipFile(os.path.join(REF_DATA, "log-data.zip")) as z:
            z.extractall(log_dir)
        with zipfile.ZipFile(os.path.join(REF_DATA, "song-data.zip")) as z:
            z.extractall(stage)  # zip contains song_data/ prefix
        open(os.path.join(stage, ".done"), "w").close()
    return {
        "logs": os.path.join(log_dir, "*.json"),
        "songs": os.path.join(song_dir, "*", "*", "*", "*.json"),
        "out": os.path.join(stage, "lake_out"),
    }


@pytest.fixture(scope="module")
def pipeline_result(spark, staged_paths):
    return ss.run_pipeline(
        spark, staged_paths["songs"], staged_paths["logs"], staged_paths["out"]
    )


def test_raw_log_events_golden(spark, staged_paths):
    logs = ss.read_log_data(spark, staged_paths["logs"])
    assert logs.count() == 8056  # multiLine=False fix (Q1): all rows survive


def test_nextsong_filter_golden(spark, staged_paths):
    logs = ss.read_log_data(spark, staged_paths["logs"])
    assert ss.filter_songplay_events(logs).count() == 6820


def test_songs_table_golden(pipeline_result):
    assert pipeline_result["songs"].count() == 71


def test_songplays_single_match_golden(pipeline_result):
    rows = pipeline_result["songplays"].collect()
    assert len(rows) == 1
    row = rows[0]
    assert row.user_id == "15"
    # deterministic surrogate key (xxhash64 of natural keys), not
    # monotonically_increasing_id — stable across runs (Q5 fix)
    assert isinstance(row.songplay_id, int)


def test_users_deduplicated(pipeline_result, spark, staged_paths):
    users = pipeline_result["users"]
    n_users = users.count()
    # one row per user (Q3 fix), not one per event
    assert n_users == users.select("user_id").distinct().count()
    logs = ss.filter_songplay_events(ss.read_log_data(spark, staged_paths["logs"]))
    n_distinct = logs.where(F.col("userId") != "").select("userId").distinct().count()
    assert n_users == n_distinct


def test_time_table_derivations(pipeline_result):
    t = pipeline_result["time"]
    row = t.orderBy("start_time").first()
    assert row.year == 2018 and row.month == 11
    assert set(t.columns) == {"start_time", "hour", "day", "week", "month", "year", "weekday"}


def test_partitioned_layout_written(staged_paths):
    # hive-style partition dirs (reference K2 layout, etl.py:120,190,226)
    songs_out = os.path.join(staged_paths["out"], "songs")
    assert any(d.startswith("year=") for d in os.listdir(songs_out))
    sp_out = os.path.join(staged_paths["out"], "songplays")
    assert any(d.startswith("year=2018") for d in os.listdir(sp_out))
