"""Statistical aggregates & grouping-set extensions.

Variance/stddev/correlation are computed from exact decimal power sums
(Σx, Σx², Σxy) recombined in double with the textbook formulas — the
only way two engines agree bit-for-bit on second-moment statistics
(their built-in one-pass algorithms differ in accumulation order).
The inputs are 2-decimal money values, so squares/products have ≤4
decimals and DECIMAL(30,8) accumulation is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..common import DEC, o_dsum, o_ts_str, ts_str
from ..registry import query


def _dec_sum(col):
    return F.sum(col.cast(DEC)).cast("double")


@query(
    "q_agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           round((CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_quantity')}
                  - {o_dsum('l_quantity')} * {o_dsum('l_quantity')})
                 / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)), 4) AS var_qty,
           round(sqrt((CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_quantity')}
                  - {o_dsum('l_quantity')} * {o_dsum('l_quantity')})
                 / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1))), 4) AS stddev_qty,
           round((CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_extendedprice')}
                  - {o_dsum('l_quantity')} * {o_dsum('l_extendedprice')})
                 / sqrt((CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_quantity')}
                         - {o_dsum('l_quantity')} * {o_dsum('l_quantity')})
                        * (CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_extendedprice * l_extendedprice')}
                           - {o_dsum('l_extendedprice')} * {o_dsum('l_extendedprice')})), 4)
             AS corr_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / Pearson correlation per return flag,
    from exact decimal power sums (one aggregation pass, 5 decimal sums)."""
    li = table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum(q).alias("sq"),
        _dec_sum(p).alias("sp"),
        _dec_sum(q * q).alias("sqq"),
        _dec_sum(p * p).alias("spp"),
        _dec_sum(q * p).alias("sqp"),
    )
    n = F.col("n").cast("double")
    var_q = (n * F.col("sqq") - F.col("sq") * F.col("sq")) / (n * (F.col("n") - 1))
    var_p = (n * F.col("spp") - F.col("sp") * F.col("sp")) / (n * (F.col("n") - 1))
    cov_num = n * F.col("sqp") - F.col("sq") * F.col("sp")
    corr = cov_num / F.sqrt(
        (n * F.col("sqq") - F.col("sq") * F.col("sq"))
        * (n * F.col("spp") - F.col("sp") * F.col("sp"))
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(var_q, 4).alias("var_qty"),
        F.round(F.sqrt(var_q), 4).alias("stddev_qty"),
        F.round(corr, 4).alias("corr_qty_price"),
    )


@query(
    "q_agg_minmax_by",
    oracle="""
    SELECT o_custkey,
           arg_min(o_orderpriority, o_orderkey) AS first_priority,
           arg_max(o_orderpriority, o_orderkey) AS last_priority,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_orderkey,
           CAST(MAX(o_orderkey) AS BIGINT) AS last_orderkey
    FROM orders
    GROUP BY o_custkey
    """,
)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax) keyed on the UNIQUE o_orderkey —
    unique ordering keys are what make argmin deterministic at all."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
        F.max_by("o_orderpriority", "o_orderkey").alias("last_priority"),
        F.min("o_orderkey").cast("bigint").alias("first_orderkey"),
        F.max("o_orderkey").cast("bigint").alias("last_orderkey"),
    )


@query(
    "q_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {o_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): status totals,
    priority totals, grand total — via the SQL surface, the idiomatic
    Spark route for arbitrary set lists."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_time_rollup",
    oracle=f"""
    SELECT {o_ts_str("date_trunc('day', ts)")} AS day,
           {o_ts_str("date_trunc('hour', ts)")} AS hour,
           COUNT(*) AS n_events,
           {o_dsum('value')} AS sum_value
    FROM events
    GROUP BY ROLLUP (1, 2)
    """,
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-hierarchy rollup: hour → day → total in one
    pass (ROLLUP over two truncation granularities). The continuous-
    aggregate pattern for event tables at scale."""
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            ts_str(F.date_trunc("day", F.col("ts"))).alias("day"),
            ts_str(F.date_trunc("hour", F.col("ts"))).alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )


@query(
    "q_agg_histogram",
    oracle=f"""
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           {o_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as floor-bucket groupBy — the distributed
    histogram primitive: map-side partial aggregation collapses each
    partition to (bucket, count, sum) before the shuffle, so the shuffle
    carries buckets, not rows, at any scale."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        F.floor(F.col("value") / 50.0).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum(F.col("value")).alias("sum_value"),
    )
