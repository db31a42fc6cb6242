"""Sketch semantics: count-min error bounds and approx-quantile accuracy
— the properties rows-only driver checks can't see."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dateng_data_lakes_apache_spark_spark.catalog import table
from dateng_data_lakes_apache_spark_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    cms_build,
    cms_estimate,
)
from dateng_data_lakes_apache_spark_spark.registry import get_queries

QS = get_queries()


def test_count_min_never_underestimates_and_bounds_error(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word")).where(
        F.col("word") != ""
    )
    words = words.persist()
    n_total = words.count()
    sketch = cms_build(words)
    exact = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    top = exact.orderBy(F.col("n").desc(), F.col("word").asc()).limit(20)
    est = cms_estimate(sketch, top.select("word"))
    rows = top.join(est, "word").collect()
    words.unpersist()
    assert len(rows) == 20  # the synthetic vocab has ≥20 distinct words
    eps = math.e / CMS_W
    for r in rows:
        # CMS one-sided error: never under, over by at most ~εN (allow 3×
        # slack — the bound is probabilistic with δ = (1/e)^d)
        assert r.cms_estimate >= r.n
        assert r.cms_estimate - r.n <= 3 * eps * n_total


def test_count_min_sketch_is_fixed_size(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    assert cms_build(words).count() <= CMS_D * CMS_W


def test_approx_quantile_tracks_exact(spark, sf_dir):
    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in QS["q_agg_approx_quantile"](spark, sf_dir).collect()
    }
    e = table(spark, sf_dir, "events")
    exact = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in e.groupBy("event_type")
        .agg(
            F.percentile(F.col("value"), F.lit(0.5)).alias("p50"),
            F.percentile(F.col("value"), F.lit(0.9)).alias("p90"),
            F.percentile(F.col("value"), F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    for et, (a50, a90, a99) in approx.items():
        e50, e90, e99 = exact[et]
        spread_ = max(abs(e99), 1.0)
        # accuracy 10000 → rank error ≤ n/10000; values are dense, so a
        # 2% value tolerance is generous and stable
        assert abs(a50 - e50) <= 0.02 * spread_
        assert abs(a90 - e90) <= 0.02 * spread_
        assert abs(a99 - e99) <= 0.02 * spread_


def test_hll_merge_estimate_within_bound(spark, sf_dir):
    """Merged region-level HLL estimates must stay within the lgK=12
    relative-error envelope (~1.6% σ; assert 3σ) of the exact count —
    and the union of child sketches must not lose cardinality."""
    rows = QS["q_sketch_hll_merge"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        err = abs(r.est_customers - r.exact_customers) / max(r.exact_customers, 1)
        assert err < 0.05, (r.n_regionkey, r.est_customers, r.exact_customers)


def test_bloom_zero_false_negatives_and_fp_bound(spark, sf_dir):
    """Every true member must be flagged (Bloom's hard guarantee) and
    the observed fp rate must stay within 10x of the analytic bound."""
    import math

    from dateng_data_lakes_apache_spark_spark.operators.sketches import (
        BLOOM_K,
        BLOOM_M,
        q_bloom_membership,
    )
    from dateng_data_lakes_apache_spark_spark.catalog import table
    from pyspark.sql import functions as F

    row = q_bloom_membership(spark, sf_dir).collect()[0]
    n_build = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select("o_custkey")
        .distinct()
        .count()
    )
    # zero false negatives: every member is flagged
    assert row.n_flagged - row.n_false_pos == row.n_members
    bound = (1 - math.exp(-BLOOM_K * n_build / BLOOM_M)) ** BLOOM_K
    assert row.n_false_pos <= max(10 * bound * row.n_probed, 1)
