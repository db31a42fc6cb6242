"""Composed star-join analytics: multi-table decision-support queries.

The reference computes exactly one composed query — the songplays fact
build (filter → 2-key join → project, etl.py:194-226). These queries
exercise the same composition grammar at decision-support depth
(TPC-H Q3/Q5/Q10 shapes over the driver's star schema): selective dims,
fact-fact equi-joins, post-join aggregation, bounded top-k output.

Scale posture: every filter sits below its join so pushdown reaches the
parquet scan; the big-big joins (orders⋈lineitem, customer⋈orders) are
declared as plain equi-joins for Catalyst/AQE to plan as shuffle joins
with partial aggregation; only the genuinely tiny dims (region, nation)
are explicitly broadcast — customer/supplier grow linearly with the lake
and must never be pinned to a broadcast. Top-k outputs carry total-order
tiebreaks and plan as TakeOrderedAndProject (never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..common import date_str, dsum, o_date_str, o_dsum
from ..registry import query

def _revenue() -> "F.Column":
    # Built lazily: Column construction needs an active SparkContext,
    # which doesn't exist at module-import (registration) time.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_O_REVENUE = "l_extendedprice * (1 - l_discount)"


@query(
    "q_starjoin_pricing",
    oracle=f"""
    SELECT l_orderkey,
           {o_dsum(_O_REVENUE)} AS revenue,
           {o_date_str('o_orderdate')} AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_starjoin_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority revenue (TPC-H Q3 shape): unshipped revenue of
    BUILDING-segment orders placed before the cutoff.

    Both fact joins shuffle on their natural keys; the segment filter
    prunes customer to ~1/5 before its join and both date predicates
    push into the parquet scans. Revenue accumulates as decimal
    (engine-exact), and the top-10 is TakeOrderedAndProject.
    """
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < "1998-07-01")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    l = (  # noqa: E741 — TPC-H's conventional lineitem alias
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > "1998-07-01")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_revenue()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            date_str(F.col("o_orderdate")).alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_starjoin_region",
    oracle=f"""
    SELECT n_name, {o_dsum(_O_REVENUE)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_starjoin_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume per nation (TPC-H Q5 shape): revenue from
    lineitems whose customer and supplier share a nation, one region,
    one order year.

    Six tables: lineitem⋈orders⋈customer are the linear-growth side
    (shuffle equi-joins, AQE-planned); supplier joins on BOTH l_suppkey
    and the customer-nation equality — the second predicate is what
    makes "local supplier" an equi-condition, not a post-filter; nation
    and region are O(25)/O(5) rows and pinned broadcast. The final sort
    is over ≤25 aggregated rows.
    """
    o = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    l = (  # noqa: E741
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select("r_regionkey")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q_starjoin_returns",
    oracle=f"""
    SELECT c_custkey, c_name, {o_dsum(_O_REVENUE)} AS revenue, c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_starjoin_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): top-20 customers by
    revenue lost to returns in one quarter.

    The quarter predicate prunes orders before the fact join; the
    returnflag filter pushes into the lineitem scan (dictionary-encoded
    column — near-free skip). Nation broadcasts; customer joins by hash.
    Top-20 with c_custkey tiebreak → TakeOrderedAndProject.
    """
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    l = (  # noqa: E741
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_revenue()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
