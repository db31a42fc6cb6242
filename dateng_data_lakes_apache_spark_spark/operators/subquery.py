"""Subquery patterns: scalar-aggregate comparison and IN-subquery.

Expressed as explicit join decompositions in the DataFrame API — the
same plans Catalyst's decorrelation produces for the SQL forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..common import o_davg
from ..registry import query


@query(
    "q_subquery_in",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT {o_davg('o_totalprice')} FROM orders)
      AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (> global avg) + IN-subquery (segment filter).

    The scalar aggregate is a 1-row DataFrame cross-joined (auto-broadcast)
    onto the fact — the distributed form of a correlated-free scalar
    subquery. The IN becomes a left-semi join. The avg threshold uses
    decimal accumulation so the filter boundary is engine-independent.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    avg_df = o.agg(
        (F.sum(F.col("o_totalprice").cast("decimal(30,8)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_price"
        )
    )
    return (
        o.crossJoin(F.broadcast(avg_df))
        .where(F.col("o_totalprice") > F.col("avg_price"))
        .join(c, o.o_custkey == c.c_custkey, "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_subquery_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
    )
    """,
)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with an extra predicate: customers having any
    order above a threshold. Decorrelates to a left-semi join with the
    predicate pushed below the join — the filter prunes the build side
    before the shuffle, not after."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o1.o_orderkey, o1.o_custkey, o1.o_totalprice
    FROM orders o1
    WHERE o1.o_totalprice > 1.5 * (
      SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
             / COUNT(*)
      FROM orders o2 WHERE o2.o_custkey = o1.o_custkey
    )
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED scalar subquery: orders more than 1.5x their own
    customer's average order value (q_subquery_in's scalar is
    uncorrelated — one global row; this one is per-group).

    Expressed as the decorrelated plan Catalyst itself produces: the
    per-customer aggregate is a groupBy on the correlation key joined
    back to the fact — one shuffle for the agg, one hash join on
    o_custkey, both partial-agg'd map-side. The threshold is a decimal
    accumulation so the > boundary is engine-independent.
    """
    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(30,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cust_avg")
    )
    return (
        o.join(per_cust.withColumnRenamed("o_custkey", "ck"), o.o_custkey == F.col("ck"))
        .where(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
