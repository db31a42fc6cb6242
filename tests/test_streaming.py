"""Streaming semantics: session-window batch twin + dedup idempotence."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dateng_data_lakes_apache_spark_spark.catalog import table
from dateng_data_lakes_apache_spark_spark.registry import get_queries

QS = get_queries()


def test_session_window_matches_gap_and_island_twin(spark, sf_dir):
    """The streaming session_window result must equal the batch
    gap-and-islands computation (30-minute inactivity gap)."""
    stream_rows = {
        (r.user_id, r.session_start, r.n_events)
        for r in QS["q_stream_session"](spark, sf_dir).collect()
    }

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    batch = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            # session_window semantics: a new session starts when the event
            # lands at-or-after prev_end = prev_ts + gap (half-open windows).
            # Compare in fractional seconds — unix_timestamp truncates and
            # would misclassify sub-second boundary gaps.
            (
                F.col("prev_ts").isNull()
                | (F.col("ts").cast("double") - F.col("prev_ts").cast("double") >= 1800.0)
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("start"), F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )
    batch_rows = {(r.user_id, r.session_start, r.n_events) for r in batch.collect()}
    assert stream_rows == batch_rows


def test_stream_dedup_counts_match_batch(spark, sf_dir):
    stream = {
        (r.event_type, r.n_unique)
        for r in QS["q_stream_dedup"](spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events")
    batch = {
        (r.event_type, r.n)
        for r in ev.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert stream == batch


def test_custom_state_matches_batch_aggregation(spark, sf_dir):
    stream = {
        (r.user_id, r.n_events, r.sum_value)
        for r in QS["q_stream_custom_state"](spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events")
    batch = {
        (r.user_id, r.n, round(r.s, 2))
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
        )
        .collect()
    }
    assert stream == batch


def test_sample_within_binomial_bounds(spark, sf_dir):
    n_total = table(spark, sf_dir, "lineitem").count()
    n_sample = QS["q_sample"](spark, sf_dir).count()
    # Bernoulli(0.1): mean n/10, sd ~ sqrt(n*0.09); allow 5 sd
    import math

    mean, sd = n_total * 0.1, math.sqrt(n_total * 0.1 * 0.9)
    assert abs(n_sample - mean) < 5 * sd
    # seeded sample is reproducible on identical input partitioning
    assert QS["q_sample"](spark, sf_dir).count() == n_sample
