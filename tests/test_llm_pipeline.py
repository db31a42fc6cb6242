"""Semantic tests for the LLM corpus-prep family — properties the
driver's rows-only check can't see (split integrity across dedup
clusters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dateng_data_lakes_apache_spark_spark.registry import get_queries

QS = get_queries()


def test_split_by_cluster_never_straddles(spark, sf_dir):
    # the leakage guarantee: every dedup cluster lands in exactly ONE
    # split — no near-dup pair can cross the train/test boundary
    out = QS["q_split_by_cluster"](spark, sf_dir)
    leaked = (
        out.groupBy("keeper_doc_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert leaked == 0
    # and it actually groups: at least one multi-doc cluster exists in
    # the fixture corpus (planted near-dups), so the guarantee is not
    # vacuously over singletons
    multi = (
        out.groupBy("keeper_doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert multi > 0
    # all three splits are populated
    assert out.select("split").distinct().count() == 3
