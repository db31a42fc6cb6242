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
