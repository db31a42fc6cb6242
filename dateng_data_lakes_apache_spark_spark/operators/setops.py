"""Set operators: UNION ALL / INTERSECT / EXCEPT ALL (absent from reference)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "q_union_all",
    oracle="""
    SELECT c_custkey AS entity_id, c_name AS entity_name, 'customer' AS kind
    FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_id, s_name AS entity_name, 'supplier' AS kind
    FROM supplier
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName — no shuffle, just concatenated partitions."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): nations having both customers and
    suppliers. Planned as an aggregate + semi-join under the hood."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT c_custkey AS custkey FROM customer
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference): order rows minus one occurrence
    per existing customer key — preserves duplicates, unlike EXCEPT."""
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.exceptAll(c)


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): union + dedup in one operator — plans as a
    hash aggregate over the concatenated inputs, so the dedup happens
    shuffle-side with map-side partials, not as a post-hoc distinct
    scan of a materialized union."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "q_union_mixed_schema",
    oracle="""
    SELECT src, event_id AS id, value, NULL AS o_totalprice
    FROM (SELECT 'events' AS src, event_id, value FROM events
          WHERE event_type = 'purchase' AND event_id % 50 = 0)
    UNION ALL BY NAME
    SELECT 'orders' AS src, o_orderkey AS id, NULL AS value, o_totalprice
    FROM orders WHERE o_orderkey % 500 = 0
    """,
)
def q_union_mixed_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union: two sources with partially overlapping
    columns combined with ``unionByName(allowMissingColumns=True)`` —
    each side's missing columns null-fill, matching by NAME, never by
    position. This is the union a lake actually performs (v1 and v2 of
    a feed, two teams' exports): positional unionAll silently pairs
    unrelated columns the moment one side adds a field.

    Map-only (no shuffle); the oracle is DuckDB's UNION ALL BY NAME
    with explicit null padding.
    """
    ev = (
        table(spark, sf_dir, "events")
        .where((F.col("event_type") == "purchase") & (F.col("event_id") % 50 == 0))
        .select(F.lit("events").alias("src"), F.col("event_id").alias("id"), "value")
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 500 == 0)
        .select(
            F.lit("orders").alias("src"),
            F.col("o_orderkey").alias("id"),
            "o_totalprice",
        )
    )
    return ev.unionByName(o, allowMissingColumns=True)


@query(
    "q_intersect_all",
    oracle="""
    SELECT o_orderpriority AS priority FROM orders
    WHERE year(o_orderdate) = 1995
    INTERSECT ALL
    SELECT o_orderpriority AS priority FROM orders
    WHERE year(o_orderdate) = 1996
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset intersection): per value, min(multiplicity
    left, multiplicity right) occurrences survive — here the demand
    profile two order-years have in COMMON, priority by priority.
    Completes the multiset pair with q_except's EXCEPT ALL: both plan as
    count-aggregates per side joined on the value (never a row-level
    join), so the shuffle carries |distinct values| rows regardless of
    input multiplicity — the scale-correct multiset algebra."""
    o = table(spark, sf_dir, "orders")
    a = o.where(F.year("o_orderdate") == 1995).select(
        F.col("o_orderpriority").alias("priority")
    )
    b = o.where(F.year("o_orderdate") == 1996).select(
        F.col("o_orderpriority").alias("priority")
    )
    return a.intersectAll(b)
