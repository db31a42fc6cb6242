"""Sketch operators: count-min (heavy hitters) and quantile sketches.

Sketches are the sublinear-memory answer to "top words / percentiles
over 100 TB": fixed-size state per partition, mergeable across
partitions. The count-min sketch here is built as PLAIN DataFrame ops —
explode over d hash rows, bucket by seeded xxhash64, count — so the
sketch itself is a (d × w) TABLE: distributed construction, mergeable
by union+sum, queryable by join. No Python in the row path.

Cormode & Muthukrishnan 2005 (count-min); Greenwald-Khanna 2001 via
Spark's approx_percentile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# d hash rows × w buckets: ε ≈ e/w ≈ 0.0027, δ ≈ (1/e)^d ≈ 0.018
CMS_D = 4
CMS_W = 1024


def cms_build(words: DataFrame, col: str = "word") -> DataFrame:
    """Count-min sketch as a (seed, bucket, c) table.

    Each word lands in one bucket per hash row (xxhash64 seeded by the
    row index — hashing the (word, seed) pair gives d independent
    families). groupBy collapses to at most d×w rows regardless of
    corpus size — the fixed-size property that makes sketches viable
    at scale; merging two corpora's sketches is union + sum.
    """
    seeds = F.explode(F.array(*[F.lit(s) for s in range(CMS_D)])).alias("seed")
    return (
        words.select(F.col(col).alias("w_"), seeds)
        .select(
            "seed",
            F.pmod(F.xxhash64("w_", F.col("seed")), F.lit(CMS_W)).alias("bucket"),
        )
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(sketch: DataFrame, queries: DataFrame, col: str = "word") -> DataFrame:
    """Point-estimate counts: min over the d (seed, bucket) cells each
    query word hashes to — an equi-join on (seed, bucket), no scan of
    the original data."""
    probes = queries.select(
        F.col(col),
        F.explode(F.array(*[F.lit(s) for s in range(CMS_D)])).alias("seed"),
    ).select(
        col,
        "seed",
        F.pmod(F.xxhash64(col, F.col("seed")), F.lit(CMS_W)).alias("bucket"),
    )
    return (
        probes.join(sketch, ["seed", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_estimate"))
    )


@query("q_sketch_count_min")  # rows-only: xxhash64 has no DuckDB twin
def q_sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via count-min: exact top-20 words (for reference)
    joined with their sketch estimates. The CMS property — estimate ≥
    true count, overestimate bounded by εN — is unit-asserted in
    tests/test_sketches.py; at scale only the sketch pass runs and the
    exact pass disappears."""
    d = table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word")).where(
        F.col("word") != ""
    )
    words = words.persist()  # feeds both the sketch and the exact top-k
    sketch = cms_build(words)
    top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("word").asc())
        .limit(20)
    )
    est = cms_estimate(sketch, top.select("word"))
    out = top.join(est, "word").select("word", "exact_n", "cms_estimate")
    words.unpersist()
    return out


@query("q_agg_approx_quantile")  # rows-only: GK sketch differs from DuckDB's exact
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna via approx_percentile):
    the mergeable quantile sketch for distributions too large to sort.
    Error vs exact percentile_cont is bound-asserted in
    tests/test_sketches.py."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_percentile(F.col("value"), F.lit(0.5), F.lit(10000)).alias("p50"),
        F.approx_percentile(F.col("value"), F.lit(0.9), F.lit(10000)).alias("p90"),
        F.approx_percentile(F.col("value"), F.lit(0.99), F.lit(10000)).alias("p99"),
    )
